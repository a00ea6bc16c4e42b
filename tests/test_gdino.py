"""GroundingDINO stack: deformable attention correctness, Swin behavior,
end-to-end tiny forward, converter structure."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from threedod.models.gdino import (
    BertEncoder,
    GroundingDINO,
    MSDeformAttn,
    SwinT,
    best_box_for_prompt,
    ms_deform_sample,
)


def naive_deform_sample(value, shapes, locs, weights):
    """Per-element python reference of grid_sample(zeros, align_corners=False)
    + level/point weighting."""
    b, _, h, d = value.shape
    lq = locs.shape[1]
    out = np.zeros((b, lq, h, d), np.float32)
    for bi in range(b):
        for qi in range(lq):
            for hi in range(h):
                off = 0
                for lvl, (hl, wl) in enumerate(shapes):
                    v = value[bi, off : off + hl * wl, hi].reshape(hl, wl, d)
                    off += hl * wl
                    for pi in range(locs.shape[4]):
                        x = locs[bi, qi, hi, lvl, pi, 0] * wl - 0.5
                        y = locs[bi, qi, hi, lvl, pi, 1] * hl - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        fx, fy = x - x0, y - y0
                        s = 0.0
                        for dy, dx, w in (
                            (0, 0, (1 - fy) * (1 - fx)),
                            (0, 1, (1 - fy) * fx),
                            (1, 0, fy * (1 - fx)),
                            (1, 1, fy * fx),
                        ):
                            yy, xx = y0 + dy, x0 + dx
                            if 0 <= yy < hl and 0 <= xx < wl:
                                s = s + w * v[yy, xx]
                        out[bi, qi, hi] += weights[bi, qi, hi, lvl, pi] * s
    return out


class TestDeformable:
    @pytest.mark.parametrize("impl", ["gather", "matmul"])
    def test_sample_matches_naive(self, impl):
        from threedod.models.gdino import deformable as dfm

        rng = np.random.RandomState(0)
        shapes = [(6, 8), (3, 4)]
        S = sum(h * w for h, w in shapes)
        B, H, D, Lq, P = 2, 2, 4, 5, 3
        value = rng.randn(B, S, H, D).astype(np.float32)
        locs = rng.uniform(-0.1, 1.1, (B, Lq, H, len(shapes), P, 2)).astype(np.float32)
        w = rng.rand(B, Lq, H, len(shapes), P).astype(np.float32)
        fn = dfm.ms_deform_sample_gather if impl == "gather" else dfm.ms_deform_sample_matmul
        got = fn(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w))
        want = naive_deform_sample(value, shapes, locs, w)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_pallas_matches_naive_interpret(self):
        """Fused Pallas backend (interpret mode on CPU) vs the python
        reference, odd Lq (padding) and OOB locations included."""
        from threedod.models.gdino import deformable as dfm

        rng = np.random.RandomState(2)
        shapes = [(6, 8), (3, 4)]
        S = sum(h * w for h, w in shapes)
        B, H, D, Lq, P = 2, 2, 4, 5, 3
        value = rng.randn(B, S, H, D).astype(np.float32)
        locs = rng.uniform(-0.1, 1.1, (B, Lq, H, len(shapes), P, 2)).astype(np.float32)
        w = rng.rand(B, Lq, H, len(shapes), P).astype(np.float32)
        got = dfm.ms_deform_sample_pallas(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
            chunk=3, interpret=True,
        )
        want = naive_deform_sample(value, shapes, locs, w)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_matmul_chunking_pads(self):
        """Lq not a multiple of the chunk (and > chunk) round-trips."""
        from threedod.models.gdino import deformable as dfm

        rng = np.random.RandomState(1)
        shapes = [(5, 7)]
        S = 35
        B, H, D, Lq, P = 1, 2, 4, 7, 2
        value = rng.randn(B, S, H, D).astype(np.float32)
        locs = rng.uniform(0, 1, (B, Lq, H, 1, P, 2)).astype(np.float32)
        w = rng.rand(B, Lq, H, 1, P).astype(np.float32)
        old = dfm.SAMPLE_CHUNK
        try:
            dfm.SAMPLE_CHUNK = 3  # forces n_chunks=3, pad=2
            got = dfm.ms_deform_sample_matmul(
                jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
            )
        finally:
            dfm.SAMPLE_CHUNK = old
        want = naive_deform_sample(value, shapes, locs, w)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_module_shapes(self):
        shapes = [(8, 8), (4, 4)]
        S = sum(h * w for h, w in shapes)
        m = MSDeformAttn(dim=32, heads=4, levels=2, points=2)
        q = jnp.zeros((1, 7, 32))
        refs = jnp.full((1, 7, 2, 2), 0.5)
        v = jnp.zeros((1, S, 32))
        out, _ = m.init_with_output(jax.random.PRNGKey(0), q, refs, v, shapes)
        assert out.shape == (1, 7, 32)

    def test_box_refs(self):
        shapes = [(8, 8)]
        m = MSDeformAttn(dim=32, heads=4, levels=1, points=2)
        q = jnp.ones((1, 3, 32))
        refs = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.2, 0.3]), (1, 3, 1, 4))
        v = jnp.ones((1, 64, 32))
        out, _ = m.init_with_output(jax.random.PRNGKey(0), q, refs, v, shapes)
        assert np.isfinite(np.asarray(out)).all()


class TestSwin:
    def test_tap_shapes_and_channels(self):
        m = SwinT()
        x = jnp.zeros((1, 64, 96, 3))
        out, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert out["p3"].shape == (1, 8, 12, 192)
        assert out["p4"].shape == (1, 4, 6, 384)
        assert out["p5"].shape == (1, 2, 3, 768)

    def test_non_multiple_of_window(self):
        # 56x72 -> stage-0 grid 14x18: forces shifted-window masking + padding
        m = SwinT(depths=(2, 2), heads=(3, 6), out_indices=(0, 1))
        x = jnp.asarray(np.random.RandomState(0).randn(1, 56, 72, 3).astype(np.float32))
        out, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert out["p2"].shape == (1, 14, 18, 96)
        assert np.isfinite(np.asarray(out["p3"])).all()

    def test_shift_changes_output(self):
        """The shifted block must mix across window boundaries: zeroing a
        far-away patch changes a local output only via shifts."""
        m = SwinT(depths=(2,), heads=(3,), out_indices=(0,))
        rng = np.random.RandomState(1)
        x = rng.randn(1, 56, 56, 3).astype(np.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        a = np.asarray(m.apply(v, jnp.asarray(x))["p2"])
        x2 = x.copy()
        x2[:, 32:, 32:] = 0.0  # patches (8+, 8+): a different 7x7 window
        b = np.asarray(m.apply(v, jnp.asarray(x2))["p2"])
        # patch (5,5) lives in window (0,0) of the unshifted block, but its
        # shifted-block window spans patches 3..9 — crossing into the zeroed
        # region. The unshifted block alone could never mix them.
        assert np.abs(a[0, 5, 5] - b[0, 5, 5]).max() > 1e-6
        # ...while (1,1)'s two-block receptive field stays in patches 0..6
        # (the shift mask blocks the wrap-around band), so it must NOT move.
        np.testing.assert_allclose(a[0, 1, 1], b[0, 1, 1], atol=1e-6)


class TestBert:
    def test_masked_tokens_do_not_leak(self):
        m = BertEncoder(vocab_size=50, dim=32, layers=2, heads=4, max_len=16)
        ids = jnp.asarray([[1, 2, 3, 4, 0, 0]])
        mask = jnp.asarray([[True, True, True, True, False, False]])
        v = m.init(jax.random.PRNGKey(0), ids, mask)
        a = np.asarray(m.apply(v, ids, mask))
        ids2 = jnp.asarray([[1, 2, 3, 4, 7, 9]])
        b = np.asarray(m.apply(v, ids2, mask))
        np.testing.assert_allclose(a[:, :4], b[:, :4], atol=1e-5)


class TestGroundingDINO:
    @pytest.fixture(scope="class")
    def tiny(self):
        model = GroundingDINO(num_queries=20, enc_layers=2, dec_layers=2)
        img = jnp.asarray(np.random.RandomState(0).randn(1, 64, 96, 3).astype(np.float32))
        ids = jnp.asarray([[101, 2598, 1012, 102]])  # [CLS] ground . [SEP]
        mask = jnp.ones((1, 4), bool)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, ids, mask)
        return model, variables, img, ids, mask

    def test_forward_shapes(self, tiny):
        model, v, img, ids, mask = tiny
        logits, boxes = jax.jit(model.apply)(v, img, ids, mask)
        assert logits.shape == (1, 20, 4)
        assert boxes.shape == (1, 20, 4)
        bx = np.asarray(boxes)
        assert ((bx >= 0) & (bx <= 1)).all()

    def test_best_box_contract(self, tiny):
        model, v, img, ids, mask = tiny
        logits, boxes = model.apply(v, img, ids, mask)
        xyxy, score = best_box_for_prompt(logits, boxes, jnp.asarray([[64, 96]]))
        xyxy = np.asarray(xyxy)
        assert xyxy.shape == (1, 4)
        assert (xyxy[:, 2] >= xyxy[:, 0]).all() and (xyxy[:, 3] >= xyxy[:, 1]).all()
        assert 0.0 <= float(score[0]) <= 1.0

    def test_text_mask_respected(self, tiny):
        """Padding token content must not change predictions."""
        model, v, img, ids, mask = tiny
        ids5 = jnp.concatenate([ids, jnp.asarray([[999]])], axis=1)
        ids5b = jnp.concatenate([ids, jnp.asarray([[444]])], axis=1)
        mask5 = jnp.concatenate([mask, jnp.asarray([[False]])], axis=1)
        la, ba = model.apply(v, img, ids5, mask5)
        lb, bb = model.apply(v, img, ids5b, mask5)
        np.testing.assert_allclose(np.asarray(ba), np.asarray(bb), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(la[..., :4]), np.asarray(lb[..., :4]), atol=1e-4
        )


class _FabricatedSD(dict):
    """Stand-in torch state dict: any key yields a transpose-tolerant array.
    Lets the converter run without a real checkpoint so its OUTPUT STRUCTURE
    can be checked against the flax init tree (shape fidelity needs the real
    file — unavailable in this image, documented in model.py)."""

    def __getitem__(self, key):
        self.accessed.add(key)
        return np.zeros((1, 1, 1, 1), np.float32)

    def __init__(self):
        super().__init__()
        self.accessed = set()

    def __contains__(self, key):
        # the official checkpoint has out-norms only for out_indices (1,2,3)
        return key != "backbone.0.norm0.weight"

    def keys(self):
        return []


class TestConverterStructure:
    def test_paths_match_flax_init(self):
        from threedod.utils.convert_weights import convert_groundingdino

        sd = _FabricatedSD()
        converted = convert_groundingdino(sd)

        model = GroundingDINO()
        img = jax.ShapeDtypeStruct((1, 64, 96, 3), jnp.float32)
        ids = jax.ShapeDtypeStruct((1, 4), jnp.int32)
        mask = jax.ShapeDtypeStruct((1, 4), jnp.bool_)
        template = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, ids, mask)

        def paths(tree):
            return {
                jax.tree_util.keystr(p)
                for p, _ in jax.tree_util.tree_leaves_with_path(tree)
            }

        got = paths(converted["params"])
        want = paths(template["params"])
        assert got == want, (
            sorted(want - got)[:8],
            sorted(got - want)[:8],
        )
