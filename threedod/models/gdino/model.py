"""GroundingDINO (Swin-T + BERT, open-vocabulary detector) in flax.

The reference consumes GroundingDINO as a git submodule (.gitmodules:1-3)
solely to produce a text-prompted "ground" box for the ground-segmentation
asset pipeline (cubercnn/data/generate_ground_segmentations.py:137-164).
This is a TPU-native implementation of the architecture:

  Swin-T (3 taps) + 1x1 GroupNorm projections + extra stride-2 level
  BERT-base text encoder -> 768->256 feature map
  feature enhancer: 6 x [text self-attn | bi-directional image<->text
    fusion | deformable image self-attn]
  language-guided query selection (top-900 by max text-token logit)
  cross-modality decoder: 6 x [query self-attn | text cross-attn |
    deformable image cross-attn] with iterative box refinement
  contrastive box-word alignment head

Numeric parity with the official checkpoint is not verifiable in this image
(no weights, zero egress; the submodule is not checked out in the reference
either) — the converter maps the official swinT_OGC key layout and is
validated structurally (tests/test_gdino.py).
"""
from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .bert import BertEncoder
from .deformable import MSDeformAttn
from .swin import SwinT


def _interleaved_sincos(pos, num, temperature):
    """Official DETR/DINO interleave: dim_t = T^(2*(i//2)/num); out[2k] =
    sin(p/t_{2k}), out[2k+1] = cos(p/t_{2k+1}) with t_{2k} == t_{2k+1}
    (torch: stack((p[0::2].sin(), p[1::2].cos()), -1).flatten(-2))."""
    i = np.arange(num)
    t = temperature ** (2 * (i // 2) / num)
    p = pos[..., None] / t  # (..., num)
    emb = jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1)
    return emb.reshape(pos.shape + (num,))


def sine_pos_embed_2d(h: int, w: int, dim: int = 256, temperature: float = 20.0):
    """(H*W, dim) positional embedding matching the official
    PositionEmbeddingSineHW (GroundingDINO backbone/position_encoding.py):
    1-based cumsum coordinates normalized by the image extent, temperature
    20 (the swinT_OGC config's temperatureH/W), interleaved sin/cos per
    frequency, concatenated (y-block, x-block)."""
    eps = 1e-6
    scale = 2 * math.pi
    # traced iota construction (constants inflate the lowered program past
    # the relay's remote_compile size limit); the f64->f32 vs f32 rounding
    # difference of the normalized coordinates is <=1 ulp
    yy, xx = jnp.meshgrid(
        jnp.arange(1, h + 1, dtype=jnp.float32),
        jnp.arange(1, w + 1, dtype=jnp.float32),
        indexing="ij",
    )
    # same op order as the official torch code (y / (H + eps) * scale)
    ys = yy / np.float32(h + eps) * np.float32(scale)
    xs = xx / np.float32(w + eps) * np.float32(scale)
    num = dim // 2
    ye = _interleaved_sincos(ys, num, temperature)
    xe = _interleaved_sincos(xs, num, temperature)
    return jnp.concatenate([ye, xe], axis=-1).reshape(h * w, dim)


def sine_pos_embed_boxes(boxes: jnp.ndarray, dim: int = 256, temperature: float = 10000.0):
    """(..., 4) cxcywh in [0,1] -> (..., 2*dim) sine embedding in the
    official gen_sineembed_for_position coordinate order (y, x, w, h)
    (GroundingDINO transformer utils; DINO lineage), interleaved sin/cos."""
    scale = 2 * math.pi
    num = dim // 2
    cx = _interleaved_sincos(boxes[..., 0] * scale, num, temperature)
    cy = _interleaved_sincos(boxes[..., 1] * scale, num, temperature)
    w = _interleaved_sincos(boxes[..., 2] * scale, num, temperature)
    h = _interleaved_sincos(boxes[..., 3] * scale, num, temperature)
    return jnp.concatenate([cy, cx, w, h], axis=-1)


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class MHA(nn.Module):
    """Plain multi-head attention with separate q/k/v inputs."""

    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        b, lq, d = q.shape
        h = self.heads
        qq = nn.Dense(d, dtype=self.dtype, name="q")(q)
        kk = nn.Dense(d, dtype=self.dtype, name="k")(k)
        vv = nn.Dense(d, dtype=self.dtype, name="v")(v)

        def split(t):
            return t.reshape(b, -1, h, d // h).transpose(0, 2, 1, 3)

        attn = (split(qq) @ split(kk).transpose(0, 1, 3, 2)) * (d // h) ** -0.5
        if mask is not None:
            pair = mask[:, None, :, :] if mask.ndim == 3 else mask[:, None, None, :]
            attn = jnp.where(pair, attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ split(vv)).transpose(0, 2, 1, 3).reshape(b, lq, d)
        return nn.Dense(d, dtype=self.dtype, name="out")(out)


class BiAttentionBlock(nn.Module):
    """GLIP-style bi-directional image<->text fusion with layer scale."""

    dim: int = 256
    embed: int = 1024
    heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vis, txt, txt_mask):
        v = nn.LayerNorm(dtype=jnp.float32, name="layer_norm_v")(vis).astype(self.dtype)
        t = nn.LayerNorm(dtype=jnp.float32, name="layer_norm_l")(txt).astype(self.dtype)
        b, lv, d = v.shape
        h = self.heads
        hd = self.embed // h
        scale = hd ** -0.5

        vq = nn.Dense(self.embed, dtype=self.dtype, name="v_proj")(v)
        tq = nn.Dense(self.embed, dtype=self.dtype, name="l_proj")(t)
        vval = nn.Dense(self.embed, dtype=self.dtype, name="values_v_proj")(v)
        tval = nn.Dense(self.embed, dtype=self.dtype, name="values_l_proj")(t)

        def split(x):
            return x.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)

        attn = split(vq) @ split(tq).transpose(0, 1, 3, 2) * scale  # (B, h, Lv, Lt)
        attn = attn - attn.max(axis=(-1, -2), keepdims=True)  # stability clamp
        attn_t = jnp.where(txt_mask[:, None, None, :], attn, -1e9)
        a_v2t = jax.nn.softmax(attn_t, axis=-1)               # vis attends text
        a_t2v = jax.nn.softmax(attn, axis=-2)                 # text attends vis
        dv = (a_v2t @ split(tval)).transpose(0, 2, 1, 3).reshape(b, lv, self.embed)
        dt = (a_t2v.transpose(0, 1, 3, 2) @ split(vval)).transpose(0, 2, 1, 3)
        dt = dt.reshape(b, -1, self.embed)
        dv = nn.Dense(self.dim, dtype=self.dtype, name="out_v_proj")(dv)
        dt = nn.Dense(self.dim, dtype=self.dtype, name="out_l_proj")(dt)
        gv = self.param("gamma_v", nn.initializers.constant(1e-4), (self.dim,))
        gl = self.param("gamma_l", nn.initializers.constant(1e-4), (self.dim,))
        # official BiAttentionBlock residuals onto the NORMALIZED features
        # (v = LN(v); v = v + gamma*delta) — a GLIP lineage quirk, verified
        # against transformers.GroundingDinoFusionLayer
        return v + gv * dv, t + gl * dt


class FFN(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x + y)
        return x.astype(self.dtype)


class EnhancerLayer(nn.Module):
    """One feature-enhancer layer: fusion + text self-attn + image deformable."""

    dim: int = 256
    levels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vis, txt, txt_mask, vis_pos, ref_points, spatial_shapes,
                 txt_pos=None, txt_self_mask=None):
        vis, txt = BiAttentionBlock(self.dim, dtype=self.dtype, name="fusion")(
            vis, txt, txt_mask
        )
        # text self-attention (text enhancer): official adds the sine
        # embedding of the per-phrase position ids to q/k, and masks
        # attention to the token's own phrase (text_self_attention_masks)
        tq = txt if txt_pos is None else txt + txt_pos
        t = MHA(self.dim, 4, dtype=self.dtype, name="text_attn")(
            tq, tq, txt, txt_self_mask if txt_self_mask is not None else txt_mask
        )
        txt = nn.LayerNorm(dtype=jnp.float32, name="text_norm")(txt + t).astype(self.dtype)
        txt = FFN(self.dim, 1024, dtype=self.dtype, name="text_ffn")(txt)
        # image deformable self-attention
        q = vis + vis_pos
        d = MSDeformAttn(self.dim, 8, self.levels, 4, dtype=self.dtype, name="deform")(
            q, ref_points, vis, spatial_shapes
        )
        vis = nn.LayerNorm(dtype=jnp.float32, name="vis_norm")(vis + d).astype(self.dtype)
        vis = FFN(self.dim, 2048, dtype=self.dtype, name="vis_ffn")(vis)
        return vis, txt


class DecoderLayer(nn.Module):
    dim: int = 256
    levels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, qpos, txt, txt_mask, vis, ref_boxes, spatial_shapes):
        # query self-attention
        s = MHA(self.dim, 8, dtype=self.dtype, name="self_attn")(q + qpos, q + qpos, q)
        q = nn.LayerNorm(dtype=jnp.float32, name="norm1")(q + s).astype(self.dtype)
        # text cross-attention
        t = MHA(self.dim, 8, dtype=self.dtype, name="ca_text")(q + qpos, txt, txt, txt_mask)
        q = nn.LayerNorm(dtype=jnp.float32, name="catext_norm")(q + t).astype(self.dtype)
        # image deformable cross-attention
        L = len(spatial_shapes)
        refs = jnp.broadcast_to(ref_boxes[:, :, None], ref_boxes.shape[:2] + (L, 4))
        d = MSDeformAttn(self.dim, 8, self.levels, 4, dtype=self.dtype, name="cross_attn")(
            q + qpos, refs, vis, spatial_shapes
        )
        q = nn.LayerNorm(dtype=jnp.float32, name="norm2")(q + d).astype(self.dtype)
        return FFN(self.dim, 2048, dtype=self.dtype, name="ffn")(q)


class BoxMLP(nn.Module):
    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x))
        return nn.Dense(4, dtype=self.dtype, name="fc3")(x)


class GroundingDINO(nn.Module):
    """Text-prompted detector. Returns (logits, boxes):
      logits: (B, Q, Lt) per-query per-text-token alignment scores
      boxes:  (B, Q, 4) cxcywh normalized
    """

    num_queries: int = 900
    dim: int = 256
    enc_layers: int = 6
    dec_layers: int = 6
    levels: int = 4
    swin_depths: Tuple[int, ...] = (2, 2, 6, 2)
    bert_layers: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, token_ids, token_mask, train: bool = False,
                 text_self_mask=None, position_ids=None):
        """text_self_mask (B, Lt, Lt) / position_ids (B, Lt): the official
        per-phrase text masks and positions from
        generate_masks_with_special_tokens_and_transfer_map (host helper
        generate_text_masks below); default to padding mask / arange."""
        # ---- backbones
        feats = SwinT(depths=self.swin_depths, dtype=self.dtype, name="backbone")(image, train=train)
        txt = BertEncoder(layers=self.bert_layers, dtype=self.dtype, name="bert")(
            token_ids,
            text_self_mask if text_self_mask is not None else token_mask,
            position_ids=position_ids,
        )
        txt = nn.Dense(self.dim, dtype=self.dtype, name="feat_map")(txt)
        # text position embedding for the enhancer self-attn (official
        # get_sine_pos_embed(position_ids, 256, exchange_xy=False))
        pos_ids_eff = (
            position_ids
            if position_ids is not None
            else jnp.broadcast_to(jnp.arange(token_ids.shape[1]), token_ids.shape)
        )
        txt_pos = _interleaved_sincos(
            pos_ids_eff.astype(jnp.float32) * 2 * math.pi, self.dim, 10000.0
        ).astype(self.dtype)

        # ---- multi-scale projections (1x1 + GN; extra stride-2 level)
        srcs = []
        shapes = []
        for i, k in enumerate(["p3", "p4", "p5"]):
            s = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name=f"input_proj{i}")(feats[k])
            s = nn.GroupNorm(32, dtype=jnp.float32, name=f"input_gn{i}")(s).astype(self.dtype)
            shapes.append((s.shape[1], s.shape[2]))
            srcs.append(s.reshape(s.shape[0], -1, self.dim))
        # explicit (1,1) padding: torch Conv2d(k=3,s=2,p=1) semantics — XLA
        # "SAME" pads (0,1) on even extents, shifting every tap by one
        extra = nn.Conv(
            self.dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="input_proj3"
        )(feats["p5"])
        extra = nn.GroupNorm(32, dtype=jnp.float32, name="input_gn3")(extra).astype(self.dtype)
        shapes.append((extra.shape[1], extra.shape[2]))
        srcs.append(extra.reshape(extra.shape[0], -1, self.dim))

        b = image.shape[0]
        vis = jnp.concatenate(srcs, axis=1)  # (B, S, C)
        self.sow("intermediates", "vis_in", vis)
        self.sow("intermediates", "txt_in", txt)
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.levels, self.dim)
        )
        pos = jnp.concatenate(
            [
                sine_pos_embed_2d(h, w, self.dim) + level_embed[i]
                for i, (h, w) in enumerate(shapes)
            ],
            axis=0,
        )[None].astype(self.dtype)

        # encoder reference points: per-token normalized centers at each
        # level — built traced (iota) so they lower as a few ops, not an
        # (S, 2) inline dense constant (program-size limit of the relay's
        # remote_compile; see swin._rel_pos_index_jnp)
        refs = []
        for h, w in shapes:
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
            refs.append(jnp.stack([xx, yy], -1).reshape(-1, 2))
        ref_pts = jnp.concatenate(refs, 0)
        ref_pts = jnp.broadcast_to(
            ref_pts[None, :, None, :], (b, ref_pts.shape[0], self.levels, 2)
        )

        # ---- feature enhancer
        for i in range(self.enc_layers):
            vis, txt = EnhancerLayer(
                self.dim, self.levels, dtype=self.dtype, name=f"enc{i}"
            )(vis, txt, token_mask, pos, ref_pts, shapes,
              txt_pos=txt_pos, txt_self_mask=text_self_mask)

        self.sow("intermediates", "vis_enc", vis)
        self.sow("intermediates", "txt_enc", txt)

        # ---- language-guided query selection
        mem = nn.Dense(self.dim, dtype=self.dtype, name="enc_output")(vis)
        mem = nn.LayerNorm(dtype=jnp.float32, name="enc_output_norm")(mem).astype(self.dtype)
        logits_all = mem @ txt.transpose(0, 2, 1)  # (B, S, Lt)
        logits_all = jnp.where(token_mask[:, None, :], logits_all, -1e9)
        score = logits_all.max(axis=-1)
        k = min(self.num_queries, score.shape[1])
        _, top_idx = jax.lax.top_k(score, k)  # (B, Q)

        enc_delta = BoxMLP(self.dim, dtype=self.dtype, name="enc_bbox")(mem)
        # official generate_encoder_output_proposals: wh = 0.05 * 2^level
        wh = np.concatenate(
            [np.full((h * w, 2), 0.05 * 2.0**i, np.float32) for i, (h, w) in enumerate(shapes)]
        )
        base = jnp.concatenate(
            [
                jnp.broadcast_to(ref_pts[:, :, 0, :], (b, ref_pts.shape[1], 2)),
                jnp.broadcast_to(jnp.asarray(wh)[None], (b, ref_pts.shape[1], 2)),
            ],
            axis=-1,
        )
        enc_boxes = jax.nn.sigmoid(enc_delta + inverse_sigmoid(base))
        ref_boxes = jnp.take_along_axis(enc_boxes, top_idx[..., None], axis=1)
        ref_boxes = jax.lax.stop_gradient(ref_boxes)

        tgt = self.param(
            "tgt_embed", nn.initializers.normal(1.0), (self.num_queries, self.dim)
        )
        q = jnp.broadcast_to(tgt[None, :k], (b, k, self.dim)).astype(self.dtype)

        # ---- cross-modality decoder with iterative refinement
        # ref_point_head is shared across decoder layers (one MLP turning the
        # 2*dim sine embedding of the 4 box coords into a query pos embed)
        rp_fc1 = nn.Dense(self.dim, dtype=self.dtype, name="ref_point_head_fc1")
        rp_fc2 = nn.Dense(self.dim, dtype=self.dtype, name="ref_point_head_fc2")
        for i in range(self.dec_layers):
            qpos_feat = sine_pos_embed_boxes(ref_boxes, self.dim)  # (..., 2*dim)
            qpos = rp_fc2(nn.relu(rp_fc1(qpos_feat)))
            q = DecoderLayer(self.dim, self.levels, dtype=self.dtype, name=f"dec{i}")(
                q, qpos, txt, token_mask, vis, ref_boxes, shapes
            )
            delta = BoxMLP(self.dim, dtype=self.dtype, name=f"bbox_embed{i}")(q)
            ref_boxes = jax.nn.sigmoid(delta + inverse_sigmoid(ref_boxes))
            ref_boxes = jax.lax.stop_gradient(ref_boxes) if train else ref_boxes

        q = nn.LayerNorm(dtype=jnp.float32, name="decoder_norm")(q).astype(self.dtype)
        logits = q @ txt.transpose(0, 2, 1)
        logits = jnp.where(token_mask[:, None, :], logits, -jnp.inf)
        return logits, ref_boxes


def best_box_for_prompt(logits, boxes, image_hw):
    """Pipeline contract of generate_ground_segmentations.py:137-164: the
    single best box for the prompt, in pixel XYXY."""
    score = jax.nn.sigmoid(logits.max(axis=-1))  # (B, Q)
    idx = jnp.argmax(score, axis=1)
    best = jnp.take_along_axis(boxes, idx[:, None, None], axis=1)[:, 0]  # cxcywh
    h = image_hw[:, 0].astype(best.dtype)
    w = image_hw[:, 1].astype(best.dtype)
    cx, cy, bw, bh = best[:, 0] * w, best[:, 1] * h, best[:, 2] * w, best[:, 3] * h
    xyxy = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1)
    return xyxy, jnp.take_along_axis(score, idx[:, None], axis=1)[:, 0]


SPECIAL_TOKEN_IDS = (101, 102, 1012, 1029)  # [CLS], [SEP], '.', '?'


def generate_text_masks(token_ids: np.ndarray, special_ids=SPECIAL_TOKEN_IDS):
    """Host-side replica of the official
    generate_masks_with_special_tokens_and_transfer_map (GroundingDINO
    groundingdino/models/GroundingDINO/groundingdino.py): special tokens
    partition the prompt into phrases; each phrase (including its trailing
    special token) self-attends, [CLS]/last-token attend only to themselves,
    and positions restart at 0 per phrase.

    token_ids: (B, L) int -> (self_mask (B, L, L) bool, position_ids (B, L))
    """
    token_ids = np.asarray(token_ids)
    b, l = token_ids.shape
    special = np.isin(token_ids, np.asarray(special_ids))
    mask = np.tile(np.eye(l, dtype=bool)[None], (b, 1, 1))
    pos = np.zeros((b, l), np.int64)
    for r in range(b):
        prev = 0
        for c in np.nonzero(special[r])[0]:
            if c == 0 or c == l - 1:
                mask[r, c, c] = True
                pos[r, c] = 0
            else:
                mask[r, prev + 1 : c + 1, prev + 1 : c + 1] = True
                pos[r, prev + 1 : c + 1] = np.arange(0, c - prev)
            prev = c
    return mask, pos
