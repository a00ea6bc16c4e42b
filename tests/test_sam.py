"""SAM flax port tests: shapes, windowing, converter key-compatibility."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threedod.models.sam import (
    ImageEncoderViT,
    Sam,
    preprocess_sam_image,
    window_partition,
    window_unpartition,
)


class TestWindows:
    def test_partition_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 26, 8).astype(np.float32))
        win, pad_hw = window_partition(x, 14)
        back = window_unpartition(win, 14, pad_hw, (20, 26))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


@pytest.fixture(scope="module")
def tiny_sam():
    """A small SAM (dim 64, 2 layers, 256px) — same code paths, fast init."""
    model = Sam(encoder_dim=64, encoder_depth=2, encoder_heads=2,
                global_attn_indexes=(1,), img_size=256)
    x = jnp.zeros((1, 256, 256, 3))
    boxes = jnp.asarray([[10.0, 20.0, 120.0, 200.0]])
    variables = model.init(jax.random.PRNGKey(0), x, boxes)
    return model, variables


class TestSam:
    def test_encoder_shape(self, tiny_sam):
        model, variables = tiny_sam
        emb = model.apply(variables, jnp.zeros((1, 256, 256, 3)), method=lambda m, x: m.encode_image(x))
        assert emb.shape == (1, 16, 16, 256)

    def test_mask_output_shape(self, tiny_sam):
        model, variables = tiny_sam
        x = jnp.asarray(np.random.RandomState(0).randn(1, 256, 256, 3).astype(np.float32))
        boxes = jnp.asarray([[10.0, 20.0, 120.0, 200.0], [50.0, 50.0, 200.0, 220.0]])
        masks = model.apply(variables, x, boxes)
        # 4x the embedding grid
        assert masks.shape == (2, 64, 64)
        assert np.isfinite(np.asarray(masks)).all()

    def test_prompt_sensitivity(self, tiny_sam):
        """Different boxes must give different masks (prompts are wired in)."""
        model, variables = tiny_sam
        x = jnp.asarray(np.random.RandomState(1).randn(1, 256, 256, 3).astype(np.float32))
        m = model.apply(
            variables, x, jnp.asarray([[10.0, 10, 100, 100], [150.0, 150, 250, 250]])
        )
        assert np.abs(np.asarray(m[0]) - np.asarray(m[1])).max() > 1e-4

    def test_vit_tiny_encoder(self):
        """Sam(encoder_type='vit_tiny'): TinyViT wiring end-to-end, plain
        and HQ (Light HQ-SAM reconstruction: vit_dim=160, stage-2 tap)."""
        x = jnp.asarray(np.random.RandomState(2).randn(1, 128, 128, 3).astype(np.float32))
        boxes = jnp.asarray([[10.0, 10.0, 100.0, 100.0]])
        for hq in (False, True):
            model = Sam(img_size=128, encoder_type="vit_tiny", hq=hq)
            variables = model.init(jax.random.PRNGKey(3), x, boxes)
            masks = model.apply(variables, x, boxes)
            assert masks.shape == (1, 32, 32)
            assert np.isfinite(np.asarray(masks)).all()

    def test_preprocess(self):
        img = jnp.asarray(np.random.rand(300, 400, 3).astype(np.float32) * 255)
        x, scale = preprocess_sam_image(img, 256)
        assert x.shape == (1, 256, 256, 3)
        assert abs(scale - 256 / 400) < 1e-6
        # padded region is zero
        assert float(jnp.abs(x[0, 200:, :, :]).max()) == 0.0


class TestSamConverter:
    def test_converter_matches_param_tree(self):
        """A synthetic torch-layout state dict converts into exactly the
        param tree the flax Sam expects (full ViT-B geometry)."""
        rng = np.random.RandomState(0)

        def w(*shape):
            return rng.randn(*shape).astype(np.float32) * 0.02

        sd = {}
        D, depth = 768, 12
        sd["image_encoder.patch_embed.proj.weight"] = w(D, 3, 16, 16)
        sd["image_encoder.patch_embed.proj.bias"] = w(D)
        sd["image_encoder.pos_embed"] = w(1, 64, 64, D)
        for i in range(depth):
            b = f"image_encoder.blocks.{i}"
            sd[f"{b}.norm1.weight"] = w(D); sd[f"{b}.norm1.bias"] = w(D)
            sd[f"{b}.norm2.weight"] = w(D); sd[f"{b}.norm2.bias"] = w(D)
            sd[f"{b}.attn.qkv.weight"] = w(3 * D, D); sd[f"{b}.attn.qkv.bias"] = w(3 * D)
            sd[f"{b}.attn.proj.weight"] = w(D, D); sd[f"{b}.attn.proj.bias"] = w(D)
            size = 2 * (64 if i in (2, 5, 8, 11) else 14) - 1
            sd[f"{b}.attn.rel_pos_h"] = w(size, 64)
            sd[f"{b}.attn.rel_pos_w"] = w(size, 64)
            sd[f"{b}.mlp.lin1.weight"] = w(4 * D, D); sd[f"{b}.mlp.lin1.bias"] = w(4 * D)
            sd[f"{b}.mlp.lin2.weight"] = w(D, 4 * D); sd[f"{b}.mlp.lin2.bias"] = w(D)
        sd["image_encoder.neck.0.weight"] = w(256, D, 1, 1)
        sd["image_encoder.neck.1.weight"] = w(256); sd["image_encoder.neck.1.bias"] = w(256)
        sd["image_encoder.neck.2.weight"] = w(256, 256, 3, 3)
        sd["image_encoder.neck.3.weight"] = w(256); sd["image_encoder.neck.3.bias"] = w(256)

        sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = w(2, 128)
        for i in range(4):
            sd[f"prompt_encoder.point_embeddings.{i}.weight"] = w(1, 256)
        sd["prompt_encoder.not_a_point_embed.weight"] = w(1, 256)
        sd["prompt_encoder.no_mask_embed.weight"] = w(1, 256)

        def attn_keys(p, down=1):
            inner = 256 // down
            sd[f"{p}.q_proj.weight"] = w(inner, 256); sd[f"{p}.q_proj.bias"] = w(inner)
            sd[f"{p}.k_proj.weight"] = w(inner, 256); sd[f"{p}.k_proj.bias"] = w(inner)
            sd[f"{p}.v_proj.weight"] = w(inner, 256); sd[f"{p}.v_proj.bias"] = w(inner)
            sd[f"{p}.out_proj.weight"] = w(256, inner); sd[f"{p}.out_proj.bias"] = w(256)

        for i in range(2):
            t = f"mask_decoder.transformer.layers.{i}"
            attn_keys(f"{t}.self_attn")
            attn_keys(f"{t}.cross_attn_token_to_image", 2)
            attn_keys(f"{t}.cross_attn_image_to_token", 2)
            for ni in range(1, 5):
                sd[f"{t}.norm{ni}.weight"] = w(256); sd[f"{t}.norm{ni}.bias"] = w(256)
            sd[f"{t}.mlp.lin1.weight"] = w(2048, 256); sd[f"{t}.mlp.lin1.bias"] = w(2048)
            sd[f"{t}.mlp.lin2.weight"] = w(256, 2048); sd[f"{t}.mlp.lin2.bias"] = w(256)
        attn_keys("mask_decoder.transformer.final_attn_token_to_image", 2)
        sd["mask_decoder.transformer.norm_final_attn.weight"] = w(256)
        sd["mask_decoder.transformer.norm_final_attn.bias"] = w(256)
        sd["mask_decoder.iou_token.weight"] = w(1, 256)
        sd["mask_decoder.mask_tokens.weight"] = w(4, 256)
        sd["mask_decoder.output_upscaling.0.weight"] = w(256, 64, 2, 2)
        sd["mask_decoder.output_upscaling.0.bias"] = w(64)
        sd["mask_decoder.output_upscaling.1.weight"] = w(64)
        sd["mask_decoder.output_upscaling.1.bias"] = w(64)
        sd["mask_decoder.output_upscaling.3.weight"] = w(64, 32, 2, 2)
        sd["mask_decoder.output_upscaling.3.bias"] = w(32)
        for i in range(4):
            h = f"mask_decoder.output_hypernetworks_mlps.{i}"
            sd[f"{h}.layers.0.weight"] = w(256, 256); sd[f"{h}.layers.0.bias"] = w(256)
            sd[f"{h}.layers.1.weight"] = w(256, 256); sd[f"{h}.layers.1.bias"] = w(256)
            sd[f"{h}.layers.2.weight"] = w(32, 256); sd[f"{h}.layers.2.bias"] = w(32)
        for i, (o, inp) in enumerate([(256, 256), (256, 256), (4, 256)]):
            sd[f"mask_decoder.iou_prediction_head.layers.{i}.weight"] = w(o, inp)
            sd[f"mask_decoder.iou_prediction_head.layers.{i}.bias"] = w(o)

        from threedod.utils.convert_weights import convert_sam

        params = convert_sam(sd)

        model = Sam()
        ref = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3)), jnp.zeros((1, 4))
        )["params"]

        def paths(tree, prefix=""):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out.update(paths(v, prefix + k + "/"))
                else:
                    out[prefix + k] = np.asarray(v).shape
            return out

        got = paths(params)
        want = paths(jax.device_get(ref))
        # upscale ConvTranspose kernels use transpose_kernel layout; compare
        # shapes after accounting for that at apply time instead
        mismatch_keys = {k for k in want if k not in got}
        extra_keys = {k for k in got if k not in want}
        assert not mismatch_keys, sorted(mismatch_keys)[:8]
        assert not extra_keys, sorted(extra_keys)[:8]
        for k in want:
            if "upscale_conv" in k and k.endswith("kernel"):
                continue
            assert got[k] == want[k], (k, got[k], want[k])

        # and the converted params actually run
        x = jnp.zeros((1, 1024, 1024, 3))
        masks = model.apply({"params": jax.tree.map(jnp.asarray, params)}, x, jnp.asarray([[10.0, 10, 500, 500]]))
        assert masks.shape == (1, 256, 256)


class TestDecomposedRelPos:
    """The subtlest SAM-encoder math, checked against a per-element
    reference (the official get_rel_pos/add_decomposed_rel_pos semantics,
    segment-anything image_encoder.py)."""

    def test_equal_sizes_vs_naive(self):
        from threedod.models.sam import _add_decomposed_rel_pos

        rng = np.random.RandomState(0)
        qh = qw = kh = kw = 5
        B, C = 2, 4
        q = rng.randn(B, qh * qw, C).astype(np.float32)
        attn = rng.randn(B, qh * qw, kh * kw).astype(np.float32)
        Rh = rng.randn(2 * qh - 1, C).astype(np.float32)
        Rw = rng.randn(2 * qw - 1, C).astype(np.float32)

        want = np.zeros((B, qh, qw, kh, kw), np.float32)
        for b in range(B):
            for i in range(qh):
                for j in range(qw):
                    qv = q[b, i * qw + j]
                    for ki in range(kh):
                        for kj in range(kw):
                            want[b, i, j, ki, kj] = (
                                attn[b, i * qw + j, ki * kw + kj]
                                + qv @ Rh[i - ki + kh - 1]
                                + qv @ Rw[j - kj + kw - 1]
                            )
        got = _add_decomposed_rel_pos(
            jnp.asarray(attn), jnp.asarray(q), jnp.asarray(Rh), jnp.asarray(Rw),
            (qh, qw), (kh, kw),
        )
        np.testing.assert_allclose(
            np.asarray(got).reshape(want.shape), want, atol=1e-5
        )

    def test_interpolation_path_runs(self):
        from threedod.models.sam import _get_rel_pos

        rel = jnp.asarray(np.random.RandomState(1).randn(27, 8).astype(np.float32))
        out = _get_rel_pos(10, 10, rel)  # 2*10-1=19 != 27 -> resize path
        assert out.shape == (10, 10, 8)
        np.testing.assert_allclose(
            np.asarray(_get_rel_pos(14, 14, jnp.asarray(np.random.randn(27, 8))))
            .shape, (14, 14, 8),
        )
