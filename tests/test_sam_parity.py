"""Numeric parity of the flax SAM port against the official torch
implementation (transformers.SamModel — the HF port of
facebookresearch/segment-anything, numerically equivalent to the
sam_vit_b_01ec64.pth architecture the reference downloads for its SAM-HQ
mask branch, call sites roi_heads.py:993-1011 / 127 / 819).

Pattern per VERDICT: random-init an official-architecture torch model,
remap its state dict to the official checkpoint naming that
utils/convert_weights.convert_sam expects, convert, and require the flax
outputs to match torch to ~1e-4 — no downloaded weights needed.
"""
from __future__ import annotations

import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from threedod.models.sam import Sam
from threedod.utils.convert_weights import convert_sam

DEPTH = 4
IMG = 256
GLOBAL = (1, 3)


def _mlp_index(sd, prefix, which, mid):
    """HF SamFeedForward(proj_in, layers.{0..n-3}, proj_out) -> official
    MLP layers.{0..n-1} index."""
    n_mid = len({k for k in sd if re.match(rf"{re.escape(prefix)}\.layers\.\d+\.weight$", k)})
    if which == "proj_in":
        return 0
    if which == "proj_out":
        return n_mid + 1
    return int(mid) + 1


def _remap(sd_t):
    """transformers.SamModel state dict -> sam_vit_b_01ec64.pth naming."""
    sd = {k: v.detach().numpy() for k, v in sd_t.items()}
    out = {}
    for k, v in sd.items():
        if k.startswith("shared_image_embedding") or "prompt_encoder.mask_embed" in k:
            continue  # unused by the box-prompt path / duplicate of pe_layer
        # feed-forward blocks: proj_in/layers/proj_out -> layers.{0..n}
        m = re.match(
            r"(mask_decoder\.(?:iou_prediction_head|output_hypernetworks_mlps\.\d+))"
            r"\.(proj_in|proj_out|layers\.(\d+))\.(weight|bias)$",
            k,
        )
        if m:
            idx = _mlp_index(sd, m.group(1), m.group(2).split(".")[0], m.group(3))
            out[f"{m.group(1)}.layers.{idx}.{m.group(4)}"] = v
            continue
        k = re.sub(r"^vision_encoder\.layers\.(\d+)\.", r"image_encoder.blocks.\1.", k)
        k = re.sub(r"^vision_encoder\.", "image_encoder.", k)
        if k.startswith("image_encoder.blocks."):
            k = k.replace(".layer_norm1.", ".norm1.").replace(".layer_norm2.", ".norm2.")
        k = k.replace("image_encoder.patch_embed.projection", "image_encoder.patch_embed.proj")
        k = k.replace("image_encoder.neck.conv1", "image_encoder.neck.0")
        k = k.replace("image_encoder.neck.layer_norm1", "image_encoder.neck.1")
        k = k.replace("image_encoder.neck.conv2", "image_encoder.neck.2")
        k = k.replace("image_encoder.neck.layer_norm2", "image_encoder.neck.3")
        k = k.replace(
            "prompt_encoder.shared_embedding.positional_embedding",
            "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
        )
        k = re.sub(
            r"^prompt_encoder\.point_embed\.(\d+)\.", r"prompt_encoder.point_embeddings.\1.", k
        )
        if "mask_decoder.transformer" in k:
            k = re.sub(r"\.layer_norm(\d)\.", r".norm\1.", k)
        k = k.replace("layer_norm_final_attn", "norm_final_attn")
        k = k.replace("mask_decoder.upscale_conv1", "mask_decoder.output_upscaling.0")
        k = k.replace("mask_decoder.upscale_layer_norm", "mask_decoder.output_upscaling.1")
        k = k.replace("mask_decoder.upscale_conv2", "mask_decoder.output_upscaling.3")
        out[k] = v
    return out


@pytest.fixture(scope="module")
def models():
    from transformers import SamConfig, SamModel

    torch.manual_seed(0)
    cfg = SamConfig()
    cfg.vision_config.num_hidden_layers = DEPTH
    cfg.vision_config.image_size = IMG
    cfg.vision_config.global_attn_indexes = list(GLOBAL)
    cfg.prompt_encoder_config.image_size = IMG
    cfg.prompt_encoder_config.image_embedding_size = IMG // 16
    hf = SamModel(cfg)
    hf.eval()
    # real checkpoints tie the image-wide and prompt positional embeddings
    # (the original SAM has ONE pe_layer); random init leaves them separate
    with torch.no_grad():
        hf.prompt_encoder.shared_embedding.positional_embedding.copy_(
            hf.shared_image_embedding.positional_embedding
        )

    params = convert_sam(_remap(hf.state_dict()), depth=DEPTH)
    sam = Sam(encoder_depth=DEPTH, global_attn_indexes=GLOBAL, img_size=IMG)
    return hf, sam, params


class TestSamParity:
    def test_image_encoder_parity(self, models):
        hf, sam, params = models
        x = np.random.RandomState(0).randn(1, 3, IMG, IMG).astype(np.float32)
        with torch.no_grad():
            t_emb = hf.vision_encoder(torch.from_numpy(x)).last_hidden_state.numpy()
        j_emb = sam.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            method=Sam.encode_image,
        )
        # torch (1, 256, h, w) vs flax (1, h, w, 256)
        np.testing.assert_allclose(
            np.asarray(j_emb), t_emb.transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
        )

    def test_box_mask_parity(self, models):
        hf, sam, params = models
        rng = np.random.RandomState(1)
        x = rng.randn(1, 3, IMG, IMG).astype(np.float32)
        boxes = np.array(
            [[20.0, 30.0, 120.0, 180.0], [5.0, 5.0, 250.0, 250.0], [100.0, 40.0, 160.0, 90.0]],
            np.float32,
        )
        with torch.no_grad():
            t_out = hf(
                pixel_values=torch.from_numpy(x),
                input_boxes=torch.from_numpy(boxes[None]),
                multimask_output=False,
            )
        t_masks = t_out.pred_masks.numpy()[0, :, 0]  # (N, 4h, 4w)
        t_iou = t_out.iou_scores.numpy()[0, :, 0]

        emb = sam.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), method=Sam.encode_image
        )

        def decode(m, image_embed, bx):
            sparse = m.prompt_encoder.encode_boxes(bx)
            dense_pe = m.prompt_encoder.dense_pe()
            img = image_embed + m.prompt_encoder.no_mask_embed[0]
            img = jnp.broadcast_to(img, (bx.shape[0],) + image_embed.shape[1:])
            return m.mask_decoder(img, dense_pe, sparse)

        j_masks, j_iou = sam.apply({"params": params}, emb, jnp.asarray(boxes), method=decode)
        np.testing.assert_allclose(np.asarray(j_masks[:, 0]), t_masks, atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(j_iou[:, 0]), t_iou, atol=2e-4, rtol=1e-3)

        # the production single-mask path must be the same slice
        j_single = sam.apply(
            {"params": params}, emb, jnp.asarray(boxes), method=Sam.decode_boxes
        )
        np.testing.assert_allclose(np.asarray(j_single), np.asarray(j_masks[:, 0]), atol=1e-6)
