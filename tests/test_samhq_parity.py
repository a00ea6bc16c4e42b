"""Numeric parity of the flax SAM-HQ port against the official torch
architecture (weights/naming via transformers.SamHQModel, the HF port of
SysCV/sam-hq — the sam_hq_vit_b.pth architecture the reference actually
loads: generate_ground_segmentations.py:11-18, in-loop use
roi_heads.py:993-1011).

Same pattern as test_sam_parity.py: random-init the official-architecture
torch model, remap its state dict to the official sam-hq checkpoint naming
that utils/convert_weights.convert_sam auto-detects, convert, and require
the flax outputs (SAM+HQ combined mask, HQ-only mask, IoU scores) to match
torch to ~1e-4 — no downloaded weights needed.

IMPORTANT CAVEAT (verified numerically here): transformers' SamHQMaskDecoder
deviates from the official SysCV/sam-hq decoder — it binds the two-way
transformer's updated image keys to a throwaway variable
(`point_embedding, iou_token_out = self.transformer(...)`) and upscales the
PRE-transformer embeddings, while the official `predict_masks` (inherited
from facebookresearch/segment-anything: `hs, src = self.transformer(...)`,
then `output_upscaling(src)`) upscales the UPDATED keys — as does
transformers' own base SamMaskDecoder. The flax port follows the official
semantics, so the torch expected values below are computed by driving the
HF submodules through the official dataflow rather than HF's forward.
"""
from __future__ import annotations

import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
pytest.importorskip("transformers.models.sam_hq")

import jax.numpy as jnp

from threedod.models.sam import Sam
from threedod.utils.convert_weights import convert_sam

from test_sam_parity import _remap

DEPTH = 4
IMG = 256
GLOBAL = (1, 3)


def _remap_hq(sd_t):
    """transformers.SamHQModel state dict -> sam_hq_vit_b.pth naming.

    The base-SAM keys ride test_sam_parity._remap; the HQ additions map to
    the official sam-hq module names (mask_decoder_hq.py __init__):
    hq_token->hf_token, hq_mask_mlp->hf_mlp.layers.{0,1,2},
    {compress_vit,encoder,mask}_{conv1,norm,conv2} -> the three Sequential
    stacks compress_vit_feat / embedding_encoder / embedding_maskfeature.
    """
    base, hq = {}, {}
    for k, v in sd_t.items():
        m = re.match(
            r"mask_decoder\.hq_mask_mlp\.(proj_in|proj_out|layers\.(\d+))\.(weight|bias)$", k
        )
        if m:
            idx = {"proj_in": 0, "layers": 1, "proj_out": 2}[m.group(1).split(".")[0]]
            if m.group(2) is not None:
                idx = 1 + int(m.group(2))
            hq[f"mask_decoder.hf_mlp.layers.{idx}.{m.group(3)}"] = v.detach().numpy()
            continue
        renames = {
            "mask_decoder.hq_token": "mask_decoder.hf_token",
            "mask_decoder.compress_vit_conv1": "mask_decoder.compress_vit_feat.0",
            "mask_decoder.compress_vit_norm": "mask_decoder.compress_vit_feat.1",
            "mask_decoder.compress_vit_conv2": "mask_decoder.compress_vit_feat.3",
            "mask_decoder.encoder_conv1": "mask_decoder.embedding_encoder.0",
            "mask_decoder.encoder_norm": "mask_decoder.embedding_encoder.1",
            "mask_decoder.encoder_conv2": "mask_decoder.embedding_encoder.3",
            "mask_decoder.mask_conv1": "mask_decoder.embedding_maskfeature.0",
            "mask_decoder.mask_norm": "mask_decoder.embedding_maskfeature.1",
            "mask_decoder.mask_conv2": "mask_decoder.embedding_maskfeature.3",
        }
        for old, new in renames.items():
            if k.startswith(old + "."):
                hq[new + k[len(old):]] = v.detach().numpy()
                break
        else:
            base[k] = v
    out = _remap(base)
    out.update(hq)
    return out


def _official_torch_decode(hf, emb, interm, boxes):
    """Drive the HF submodules through the OFFICIAL sam-hq decoder dataflow
    (SysCV/sam-hq mask_decoder_hq.py predict_masks + forward): upscale the
    transformer-UPDATED keys; HQ mask from embedding_maskfeature(upscaled)
    + fused hq_features; masks[:, :5]; iou over the 4 SAM tokens.

    emb: (1, C, h, w) neck output; interm: (1, h, w, vit_dim) early ViT
    feature; boxes: (N, 4). Returns (masks (N, 5, 4h, 4w), iou (N, 4)).
    """
    d = hf.mask_decoder
    with torch.no_grad():
        sparse, dense = hf.prompt_encoder(
            input_points=None, input_labels=None,
            input_boxes=torch.from_numpy(boxes[None]), input_masks=None,
        )
        image_pe = hf.get_image_wide_positional_embeddings()

        # hq_features fusion (official MaskDecoderHQ.forward)
        vit = interm.permute(0, 3, 1, 2).contiguous()
        e = d.encoder_conv2(d.activation(d.encoder_norm(d.encoder_conv1(emb))))
        c = d.compress_vit_conv2(
            d.activation(d.compress_vit_norm(d.compress_vit_conv1(vit)))
        )
        hq_features = e + c  # (1, C/8, 4h, 4w)

        n = boxes.shape[0]
        out_toks = torch.cat([d.iou_token.weight, d.mask_tokens.weight, d.hq_token.weight], 0)
        tokens = torch.cat([out_toks[None, None].expand(1, n, -1, -1), sparse], dim=2)
        src = (emb + dense).repeat_interleave(n, 0)
        pos = image_pe.repeat_interleave(n, 0)
        point_embedding, keys = d.transformer(
            point_embeddings=tokens, image_embeddings=src,
            image_positional_embeddings=pos,
            attention_similarity=None, target_embedding=None,
        )
        iou_token_out = point_embedding[:, :, 0, :]
        mask_tokens_out = point_embedding[:, :, 1:7, :]

        b, c_, h, w = src.shape
        # official: upscale the UPDATED keys
        upd = keys.transpose(2, 3).reshape(n, c_, h, w)
        up = d.upscale_conv1(upd)
        up = d.activation(d.upscale_layer_norm(up))
        up = d.activation(d.upscale_conv2(up))
        up_hq = d.mask_conv2(d.activation(d.mask_norm(d.mask_conv1(up)))) + hq_features

        hypers = [
            d.output_hypernetworks_mlps[i](mask_tokens_out[0, :, i]) for i in range(4)
        ] + [d.hq_mask_mlp(mask_tokens_out[0, :, 4])]
        hyper = torch.stack(hypers, dim=1)  # (N, 5, C/8)
        _, cc, hh, ww = up.shape
        m_sam = (hyper[:, :4] @ up.reshape(n, cc, hh * ww)).reshape(n, 4, hh, ww)
        m_hq = (hyper[:, 4:] @ up_hq.reshape(n, cc, hh * ww)).reshape(n, 1, hh, ww)
        masks = torch.cat([m_sam, m_hq], 1)
        iou = d.iou_prediction_head(iou_token_out)[0]
    return masks.numpy(), iou.numpy()


@pytest.fixture(scope="module")
def models():
    from transformers import SamHQConfig, SamHQModel

    torch.manual_seed(0)
    cfg = SamHQConfig()
    cfg.vision_config.num_hidden_layers = DEPTH
    cfg.vision_config.image_size = IMG
    cfg.vision_config.global_attn_indexes = list(GLOBAL)
    cfg.prompt_encoder_config.image_size = IMG
    cfg.prompt_encoder_config.image_embedding_size = IMG // 16
    hf = SamHQModel(cfg)
    hf.eval()
    # real checkpoints tie the image-wide and prompt positional embeddings
    with torch.no_grad():
        hf.prompt_encoder.shared_embedding.positional_embedding.copy_(
            hf.shared_image_embedding.positional_embedding
        )

    remapped = _remap_hq(hf.state_dict())
    params = convert_sam(remapped, depth=DEPTH)
    assert "hf_token" in params["mask_decoder"], "HQ auto-detect failed"
    sam = Sam(encoder_depth=DEPTH, global_attn_indexes=GLOBAL, img_size=IMG, hq=True)
    return hf, sam, params


class TestSamHQParity:
    def test_encoder_and_interm_parity(self, models):
        hf, sam, params = models
        x = np.random.RandomState(0).randn(1, 3, IMG, IMG).astype(np.float32)
        with torch.no_grad():
            t_out = hf.vision_encoder(torch.from_numpy(x))
        t_emb = t_out.last_hidden_state.numpy()
        t_interm = t_out.intermediate_embeddings[0].numpy()  # (1, h, w, dim)
        j_emb, j_interm = sam.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            method=Sam.encode_image,
        )
        np.testing.assert_allclose(
            np.asarray(j_emb), t_emb.transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(np.asarray(j_interm), t_interm, atol=2e-4, rtol=1e-3)

    def test_box_mask_parity(self, models):
        hf, sam, params = models
        rng = np.random.RandomState(1)
        x = rng.randn(1, 3, IMG, IMG).astype(np.float32)
        boxes = np.array(
            [[20.0, 30.0, 120.0, 180.0], [5.0, 5.0, 250.0, 250.0], [100.0, 40.0, 160.0, 90.0]],
            np.float32,
        )
        with torch.no_grad():
            venc = hf.vision_encoder(torch.from_numpy(x))
        t_masks, t_iou = _official_torch_decode(
            hf, venc.last_hidden_state, venc.intermediate_embeddings[0], boxes
        )

        emb = sam.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), method=Sam.encode_image
        )

        def decode_raw(m, e, b):
            image_embed, vit_feat = e
            sparse = m.prompt_encoder.encode_boxes(b)
            dense_pe = m.prompt_encoder.dense_pe()
            img = image_embed + m.prompt_encoder.no_mask_embed[0]
            img = jnp.broadcast_to(img, (b.shape[0],) + image_embed.shape[1:])
            hq_feat = m.mask_decoder.hq_features(image_embed, vit_feat)
            return m.mask_decoder(img, dense_pe, sparse, hq_feat)

        j_masks, j_iou = sam.apply({"params": params}, emb, jnp.asarray(boxes), method=decode_raw)
        j_masks, j_iou = np.asarray(j_masks), np.asarray(j_iou)
        np.testing.assert_allclose(j_masks, t_masks, atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(j_iou, t_iou, atol=2e-4, rtol=1e-3)

        # the production combined / hq-only outputs are the documented
        # slices of the raw decode (official forward, hq_token_only both ways)
        j_comb = sam.apply(
            {"params": params}, emb, jnp.asarray(boxes), method=Sam.decode_boxes
        )
        np.testing.assert_allclose(
            np.asarray(j_comb), t_masks[:, 0] + t_masks[:, 4], atol=1e-3, rtol=1e-3
        )
        j_hq = sam.apply(
            {"params": params}, emb, jnp.asarray(boxes),
            method=lambda m, e, b: m.decode_boxes(e, b, hq_token_only=True),
        )
        np.testing.assert_allclose(np.asarray(j_hq), t_masks[:, 4], atol=5e-4, rtol=1e-3)

    def test_production_single_call(self, models):
        """The __call__ contract (the reference's multimask_output=False,
        hq_token_only=False default) equals encode+decode composition."""
        hf, sam, params = models
        rng = np.random.RandomState(2)
        x = rng.randn(1, IMG, IMG, 3).astype(np.float32)
        boxes = np.array([[10.0, 10.0, 200.0, 220.0]], np.float32)
        j1 = sam.apply({"params": params}, jnp.asarray(x), jnp.asarray(boxes))
        emb = sam.apply({"params": params}, jnp.asarray(x), method=Sam.encode_image)
        j2 = sam.apply({"params": params}, emb, jnp.asarray(boxes), method=Sam.decode_boxes)
        np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-6)
