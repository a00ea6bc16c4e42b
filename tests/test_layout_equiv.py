"""Round-5 layout-rewrite equivalence pins.

Each inference-path layout rewrite (bitpacked NMS words, merged per-level
NMS lanes, conv-expressed space-to-depth, spatial-pad pooled heads) claims
BIT-identical results to the form it replaced; these tests pin that claim
on randomized and adversarial inputs so a future edit can't silently turn
an exact rewrite into an approximate one.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from threedod.ops.nms import nms_mask


def _unpacked_fixpoint(boxes, scores, thr, valid):
    """The r4 reference recursion: whole-matrix Jacobi fixpoint."""
    from threedod.geometry.boxes2d import pairwise_iou

    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    sb, sv = boxes[order], valid[order]
    iou = pairwise_iou(sb, sb)
    earlier = jnp.arange(n)[None, :] < jnp.arange(n)[:, None]
    sup = (iou > thr) & earlier & sv[None, :]

    def cond(c):
        k, p, f = c
        return f | jnp.any(k != p)

    def body(c):
        k, _, _ = c
        return sv & ~jnp.any(sup & k[None, :], axis=1), k, jnp.zeros((), bool)

    ks, _, _ = jax.lax.while_loop(cond, body, (sv, sv, jnp.ones((), bool)))
    return jnp.zeros((n,), bool).at[order].set(ks)


class TestBitpackedNMS:
    def test_matches_unpacked_fixpoint(self):
        rng = np.random.default_rng(0)
        for trial in range(12):
            n = int(rng.integers(3, 400))
            centers = rng.uniform(0, 100, (n, 2))
            wh = rng.uniform(5, 40, (n, 2))
            boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
            scores = rng.uniform(0, 1, n).astype(np.float32)
            scores[rng.integers(0, n, n // 5)] = 0.5  # ties
            valid = rng.uniform(0, 1, n) > 0.1
            a = np.asarray(
                _unpacked_fixpoint(jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid))
            )
            b = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid)))
            assert (a == b).all(), trial

    def test_vmapped_lanes_independent(self):
        # the merged per-level RPN call runs (B*L) lanes in one vmap; each
        # lane must equal its solo run (extra rounds on converged lanes are
        # no-ops)
        rng = np.random.default_rng(1)
        B, n = 7, 160
        xy = rng.uniform(0, 60, (B, n, 2))
        wh = rng.uniform(2, 30, (B, n, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.uniform(0, 1, (B, n)).astype(np.float32)
        valid = rng.uniform(0, 1, (B, n)) > 0.2
        lanes = np.asarray(
            jax.vmap(lambda b, s, v: nms_mask(b, s, 0.6, valid=v))(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)
            )
        )
        for i in range(B):
            solo = np.asarray(
                nms_mask(jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.6, jnp.asarray(valid[i]))
            )
            assert (lanes[i] == solo).all(), i

    def test_padded_lane_is_inert(self):
        # RPN pads short levels with score=-inf/valid=False rows; they must
        # neither be kept nor change any real entry's keep
        rng = np.random.default_rng(2)
        n, pad = 90, 38
        xy = rng.uniform(0, 50, (n, 2))
        wh = rng.uniform(4, 25, (n, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        base = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        bp = np.concatenate([boxes, np.zeros((pad, 4), np.float32)])
        sp = np.concatenate([scores, np.full((pad,), -np.inf, np.float32)])
        vp = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        got = np.asarray(
            nms_mask(jnp.asarray(bp), jnp.asarray(sp), 0.5, valid=jnp.asarray(vp))
        )
        assert (got[:n] == base).all()
        assert not got[n:].any()


class TestSpaceToDepthConv:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_bit_equal_fwd_bwd(self, dtype):
        from threedod.models.backbones.block_conv import (
            space_to_depth,
            space_to_depth_conv,
        )

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)), dtype)
        a = np.asarray(space_to_depth(x, 4).astype(jnp.float32))
        b = np.asarray(space_to_depth_conv(x, 4).astype(jnp.float32))
        assert np.array_equal(a, b)
        if dtype == jnp.float32:
            g1 = jax.grad(lambda t: (space_to_depth(t, 4) ** 2).sum())(x)
            g2 = jax.grad(lambda t: (space_to_depth_conv(t, 4) ** 2).sum())(x)
            assert np.array_equal(np.asarray(g1), np.asarray(g2))


class TestSpatialPadDense:
    def test_equals_dense_and_ignores_pad(self):
        import flax.linen as nn

        from threedod.models.heads import SpatialPadDense

        rng = np.random.default_rng(4)
        m = SpatialPadDense(features=24, valid_hw=7, dtype=jnp.float32)
        x7 = jnp.asarray(rng.standard_normal((5, 7, 7, 16)), jnp.float32)
        x8 = jnp.pad(x7, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=11.3)
        v = m.init(jax.random.PRNGKey(0), x7)
        a = m.apply(v, x7)
        d = nn.Dense(24)
        b = d.apply(
            {"params": {"kernel": v["params"]["kernel"], "bias": v["params"]["bias"]}},
            x7.reshape(5, -1),
        )
        assert np.array_equal(np.asarray(a), np.asarray(b))
        c = m.apply(v, x8)
        # zero-padded-kernel fold: on TPU the MXU accumulates K
        # sequentially so interleaved zero terms leave every partial sum
        # bit-identical (pinned on hardware by the DESIGN 17 A/B drill);
        # CPU dots block K differently at the padded width, so host
        # equality is ulp-level only
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-6, atol=2e-6)
        # pad rows receive exactly-zero gradient
        g = jax.grad(lambda t: (m.apply(v, t) ** 2).sum())(x8)
        assert np.asarray(g)[:, 7, :, :].max() == 0.0
        assert np.asarray(g)[:, :, 7, :].max() == 0.0

    def test_heads_accept_both_grids(self):
        from threedod.models.heads import BoxHeadMLP, CubeHeadNet

        rng = np.random.default_rng(5)
        x7 = jnp.asarray(rng.standard_normal((4, 7, 7, 32)), jnp.float32)
        x8 = jnp.pad(x7, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=2.5)
        bh = BoxHeadMLP(num_fc=2, fc_dim=64, pool_hw=7)
        v = bh.init(jax.random.PRNGKey(0), x7)
        assert v["params"]["fc1"]["kernel"].shape == (7 * 7 * 32, 64)
        np.testing.assert_allclose(
            np.asarray(bh.apply(v, x7)), np.asarray(bh.apply(v, x8)),
            rtol=2e-5, atol=2e-5,
        )
        chm = CubeHeadNet(num_classes=5, num_fc=2, fc_dim=64, pool_hw=7)
        vc = chm.init(jax.random.PRNGKey(1), x7)
        o7 = chm.apply(vc, x7)
        o8 = chm.apply(vc, x8)
        for a, b in zip(jax.tree_util.tree_leaves(o7), jax.tree_util.tree_leaves(o8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


class TestGroupedBackward:
    def test_grouped_bit_equals_serialized(self):
        # the image-interleaved concurrent RMW schedule must reproduce the
        # serialized backward BIT-exactly (only same-image ROIs share dbuf
        # cells and the interleave preserves each image's ROI order); also
        # verified bit-exact on v5e hardware (DESIGN 17e)
        import threedod.ops.roi_align_pallas as rap

        rng = np.random.RandomState(7)
        B = 2
        feats = {
            "p2": jnp.asarray(rng.randn(B, 64, 80, 128).astype(np.float32)),
            "p3": jnp.asarray(rng.randn(B, 32, 40, 128).astype(np.float32)),
        }
        xy = rng.uniform(-10, 250, (B, 40, 2)).astype(np.float32)
        wh = np.exp(rng.uniform(np.log(4), np.log(200), (B, 40, 2))).astype(np.float32)
        boxes = jnp.asarray(np.clip(np.concatenate([xy, xy + wh], -1), 0, None))
        cot = jnp.asarray(rng.randn(B, 40, 7, 7, 128).astype(np.float32))

        def loss(f):
            return jnp.sum(rap.multilevel_roi_align_tpu(f, boxes) * cot)

        old_interp, old_grouped = rap.FORCE_INTERPRET, rap.BWD_GROUPED
        try:
            rap.FORCE_INTERPRET = True
            rap.BWD_GROUPED = True
            rap._make_pooler.cache_clear()
            g1 = jax.grad(loss)(feats)
            rap.BWD_GROUPED = False
            rap._make_pooler.cache_clear()
            g0 = jax.grad(loss)(feats)
        finally:
            rap.FORCE_INTERPRET = old_interp
            rap.BWD_GROUPED = old_grouped
            rap._make_pooler.cache_clear()
        for k in feats:
            assert np.array_equal(np.asarray(g1[k]), np.asarray(g0[k])), k
