"""Segment-Anything (ViT-B) in flax: box-prompted instance masks on TPU.

Replaces the reference's SAM-HQ torch submodule (used in the training loop
at roi_heads.py:993-1011 / 208-229 and offline at
generate_ground_segmentations.py): image encoder (windowed ViT with
decomposed relative position embeddings + neck), prompt encoder (random
Fourier positional encoding + box-corner embeddings), and the two-way
transformer mask decoder. The standard SAM checkpoint layout
(`sam_vit_b_01ec64.pth`) converts via utils/convert_weights.convert_sam.

Pipeline contract parity (not line parity): `SamPredictor.masks_for_boxes`
returns one (H, W) bool mask per prompted box, like the reference's
`object_masks`.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# image encoder
# ---------------------------------------------------------------------------

class LayerNorm2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-6) * w + b


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Interpolated relative position embeddings (SAM decomposed rel-pos)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def _add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_hw, k_hw):
    qh, qw = q_hw
    kh, kw = k_hw
    Rh = _get_rel_pos(qh, kh, rel_pos_h)
    Rw = _get_rel_pos(qw, kw, rel_pos_w)
    b, _, dim = q.shape
    r_q = q.reshape(b, qh, qw, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    # expand each (b, q, kh)/(b, q, kw) bias to the full lane-dense
    # (b, q, kh*kw) key axis with exact one-nonzero-per-column iota
    # selector matmuls instead of the 5D broadcast-add
    # (attn.reshape(b,qh,qw,kh,kw) + rel_h[...,None] + rel_w[...,None,:]):
    # that 5D form measured 16.3 ms per 4096-token global block on v5e —
    # 65 ms of the 85 ms SAM encoder (tools/profile_sam_enc.py, round 4)
    kk = jnp.arange(kh * kw)
    eh = (jnp.arange(kh)[:, None] == kk // kw).astype(attn.dtype)
    ew = (jnp.arange(kw)[:, None] == kk % kw).astype(attn.dtype)
    bias = jnp.einsum(
        "bqh,hk->bqk", rel_h.reshape(b, qh * qw, kh).astype(attn.dtype), eh
    ) + jnp.einsum(
        "bqw,wk->bqk", rel_w.reshape(b, qh * qw, kw).astype(attn.dtype), ew
    )
    return attn + bias


class SamAttention(nn.Module):
    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C)."""
        b, h, w, c = x.shape
        head = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head).transpose(2, 0, 3, 1, 4)
        q, k, v = (
            qkv[0].reshape(b * self.num_heads, h * w, head),
            qkv[1].reshape(b * self.num_heads, h * w, head),
            qkv[2].reshape(b * self.num_heads, h * w, head),
        )
        attn = (q * (head**-0.5)) @ jnp.swapaxes(k, -1, -2)
        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, head)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, head)
            )
            attn = _add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, (h, w), (h, w))
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).reshape(b, self.num_heads, h, w, head)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def window_partition(x, window: int):
    b, h, w, c = x.shape
    ph = (window - h % window) % window
    pw = (window - w % window) % window
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c), (hp, wp)


def window_unpartition(win, window: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // window // window)
    x = win.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class SamBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 14
    global_attn: bool = False
    input_size: Tuple[int, int] = (64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        if not self.global_attn:
            win, pad_hw = window_partition(h, self.window)
            win = SamAttention(
                self.dim, self.num_heads, input_size=(self.window, self.window),
                dtype=self.dtype, name="attn",
            )(win)
            h = window_unpartition(win, self.window, pad_hw, (x.shape[1], x.shape[2]))
        else:
            h = SamAttention(
                self.dim, self.num_heads, input_size=self.input_size,
                dtype=self.dtype, name="attn",
            )(h)
        x = shortcut + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="mlp_lin1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_lin2")(h)
        return x + h


class ImageEncoderViT(nn.Module):
    img_size: int = 1024
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    out_chans: int = 256
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    window: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_interm: bool = False):
        """x: (B, H, W, 3) pixel-normalised; returns (B, H/16, W/16, 256)
        (plus the first global-attn block's (B, H/16, W/16, dim) feature
        when `return_interm` — the SAM-HQ early-ViT tap)."""
        grid = self.img_size // self.patch_size
        x = nn.Conv(
            self.dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), dtype=self.dtype, name="patch_embed",
        )(x)
        pos = self.param("pos_embed", nn.initializers.zeros, (1, grid, grid, self.dim))
        if x.shape[1] != grid or x.shape[2] != grid:
            pos = jax.image.resize(pos, (1, x.shape[1], x.shape[2], self.dim), method="bicubic")
        x = x + pos
        hw = (x.shape[1], x.shape[2])
        interm = None
        for i in range(self.depth):
            x = SamBlock(
                self.dim, self.num_heads, self.window,
                global_attn=i in self.global_attn_indexes,
                input_size=hw, dtype=self.dtype, name=f"block{i}",
            )(x)
            if interm is None and i in self.global_attn_indexes:
                # SAM-HQ taps the FIRST global-attention block's output as
                # the "early ViT feature" for its global-local fusion
                # (sam-hq MaskDecoderHQ: interm_embeddings[0])
                interm = x
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck0")(x)
        x = LayerNorm2d(self.out_chans, name="neck1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="neck2")(x)
        x = LayerNorm2d(self.out_chans, name="neck3")(x)
        if return_interm:
            return x, interm
        return x


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------

class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, self.embed_dim // 2)
        )
        # 0: neg point, 1: pos point, 2: box corner 1, 3: box corner 2
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )

    def _pe_encoding(self, coords01):
        """coords01 in [0, 1]^2 -> Fourier features (…, embed_dim)."""
        coords = 2.0 * coords01 - 1.0
        coords = coords @ self.pe_gaussian
        coords = 2 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def dense_pe(self):
        h, w = self.image_embedding_size
        ys = (jnp.arange(h) + 0.5) / h
        xs = (jnp.arange(w) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2)
        return self._pe_encoding(grid)  # (h, w, C)

    def encode_boxes(self, boxes):
        """boxes (N, 4) XYXY in input-image pixels -> sparse embeds (N, 2, C)."""
        coords = boxes.reshape(-1, 2, 2) + 0.5
        coords = coords / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], coords.dtype
        )
        pe = self._pe_encoding(coords)
        pe = pe.at[:, 0, :].add(self.point_embeddings[2])
        pe = pe.at[:, 1, :].add(self.point_embeddings[3])
        return pe

    def __call__(self, boxes):
        return self.encode_boxes(boxes), self.no_mask_embed


# ---------------------------------------------------------------------------
# mask decoder (two-way transformer)
# ---------------------------------------------------------------------------

class TwoWayAttention(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.embed_dim // self.downsample_rate
        head = inner // self.num_heads
        qq = nn.Dense(inner, name="q_proj")(q)
        kk = nn.Dense(inner, name="k_proj")(k)
        vv = nn.Dense(inner, name="v_proj")(v)

        def split(x):
            b, n, c = x.shape
            return x.reshape(b, n, self.num_heads, head).transpose(0, 2, 1, 3)

        a = split(qq) @ jnp.swapaxes(split(kk), -1, -2) / jnp.sqrt(head)
        a = jax.nn.softmax(a, axis=-1)
        out = a @ split(vv)
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], inner)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


class MaskDecoder(nn.Module):
    """SAM two-way-transformer mask decoder; with ``hq=True`` it becomes the
    SAM-HQ MaskDecoderHQ (sam-hq modeling/mask_decoder_hq.py): one extra
    HQ-output token + hypernetwork MLP, and a global-local fused feature
    plane (`embedding_encoder` on the neck output + `compress_vit_feat` on
    the early ViT feature) that only the HQ mask reads. The IoU head still
    predicts 4 scores (it predates the HQ token in the official layout)."""

    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    num_multimask: int = 3
    iou_head_depth: int = 3
    hq: bool = False
    vit_dim: int = 768  # early-ViT channel count (encoder dim) for compress_vit

    def setup(self):
        n_masks = self.num_multimask + 1
        self.iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, self.embed_dim))
        self.mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (n_masks, self.embed_dim)
        )
        self.layers = [
            dict(
                self_attn=TwoWayAttention(self.embed_dim, self.num_heads, name=f"l{i}_self_attn"),
                norm1=nn.LayerNorm(name=f"l{i}_norm1"),
                cross_t2i=TwoWayAttention(self.embed_dim, self.num_heads, 2, name=f"l{i}_cross_t2i"),
                norm2=nn.LayerNorm(name=f"l{i}_norm2"),
                mlp1=nn.Dense(self.mlp_dim, name=f"l{i}_mlp1"),
                mlp2=nn.Dense(self.embed_dim, name=f"l{i}_mlp2"),
                norm3=nn.LayerNorm(name=f"l{i}_norm3"),
                cross_i2t=TwoWayAttention(self.embed_dim, self.num_heads, 2, name=f"l{i}_cross_i2t"),
                norm4=nn.LayerNorm(name=f"l{i}_norm4"),
            )
            for i in range(2)
        ]
        self.final_attn = TwoWayAttention(self.embed_dim, self.num_heads, 2, name="final_attn")
        self.norm_final = nn.LayerNorm(name="norm_final")
        self.upscale_conv1 = nn.ConvTranspose(self.embed_dim // 4, (2, 2), strides=(2, 2), transpose_kernel=True, name="upscale_conv1")
        self.upscale_norm = LayerNorm2d(self.embed_dim // 4, name="upscale_norm")
        self.upscale_conv2 = nn.ConvTranspose(self.embed_dim // 8, (2, 2), strides=(2, 2), transpose_kernel=True, name="upscale_conv2")
        self.hyper_mlps = [
            [
                nn.Dense(self.embed_dim, name=f"hyper{i}_0"),
                nn.Dense(self.embed_dim, name=f"hyper{i}_1"),
                nn.Dense(self.embed_dim // 8, name=f"hyper{i}_2"),
            ]
            for i in range(self.num_multimask + 1)
        ]
        self.iou_mlp = [
            nn.Dense(self.embed_dim, name="iou_mlp_0"),
            nn.Dense(self.embed_dim, name="iou_mlp_1"),
            nn.Dense(self.num_multimask + 1, name="iou_mlp_2"),
        ]
        if self.hq:
            ed = self.embed_dim
            self.hf_token = self.param("hf_token", nn.initializers.normal(1.0), (1, ed))
            self.hf_mlp = [
                nn.Dense(ed, name="hf_mlp_0"),
                nn.Dense(ed, name="hf_mlp_1"),
                nn.Dense(ed // 8, name="hf_mlp_2"),
            ]
            # Sequential(ConvT 2x2 s2, LayerNorm2d, GELU, ConvT 2x2 s2)
            self.compress_vit_conv1 = nn.ConvTranspose(
                ed, (2, 2), strides=(2, 2), transpose_kernel=True, name="compress_vit_conv1"
            )
            self.compress_vit_norm = LayerNorm2d(ed, name="compress_vit_norm")
            self.compress_vit_conv2 = nn.ConvTranspose(
                ed // 8, (2, 2), strides=(2, 2), transpose_kernel=True, name="compress_vit_conv2"
            )
            self.encoder_conv1 = nn.ConvTranspose(
                ed // 4, (2, 2), strides=(2, 2), transpose_kernel=True, name="encoder_conv1"
            )
            self.encoder_norm = LayerNorm2d(ed // 4, name="encoder_norm")
            self.encoder_conv2 = nn.ConvTranspose(
                ed // 8, (2, 2), strides=(2, 2), transpose_kernel=True, name="encoder_conv2"
            )
            # Sequential(Conv 3x3, LayerNorm2d, GELU, Conv 3x3)
            self.mask_conv1 = nn.Conv(ed // 4, (3, 3), padding="SAME", name="mask_conv1")
            self.mask_norm = LayerNorm2d(ed // 4, name="mask_norm")
            self.mask_conv2 = nn.Conv(ed // 8, (3, 3), padding="SAME", name="mask_conv2")

    def hq_features(self, image_embed, vit_feat):
        """Global-local fusion plane (1, 4h, 4w, C/8): embedding_encoder on
        the neck output + compress_vit_feat on the early ViT feature
        (sam-hq MaskDecoderHQ.forward)."""
        e = self.encoder_conv1(image_embed)
        e = self.encoder_conv2(nn.gelu(self.encoder_norm(e), approximate=False))
        c = self.compress_vit_conv1(vit_feat)
        c = self.compress_vit_conv2(nn.gelu(self.compress_vit_norm(c), approximate=False))
        return e + c

    def __call__(self, image_embed, image_pe, sparse_prompts, hq_feat=None):
        """image_embed (N, h, w, C); image_pe (h, w, C); sparse (N, P, C);
        hq_feat (1, 4h, 4w, C/8) fused plane (HQ mode only).

        Returns (masks (N, n_tokens, 4h, 4w), iou_pred (N, num_multimask+1))
        where n_tokens = num_multimask + 1 (+1 HQ mask last, in HQ mode).
        """
        n = sparse_prompts.shape[0]
        h, w = image_embed.shape[1:3]
        toks = [
            jnp.broadcast_to(self.iou_token, (n, 1, self.embed_dim)),
            jnp.broadcast_to(
                self.mask_tokens, (n, self.num_multimask + 1, self.embed_dim)
            ),
        ]
        if self.hq:
            toks.append(jnp.broadcast_to(self.hf_token, (n, 1, self.embed_dim)))
        tokens = jnp.concatenate(toks + [sparse_prompts], axis=1)
        src = image_embed.reshape(n, h * w, self.embed_dim)
        pos = jnp.broadcast_to(image_pe.reshape(1, h * w, self.embed_dim), src.shape)

        queries, keys = tokens, src
        for i, L in enumerate(self.layers):
            # SAM TwoWayAttentionBlock: the first layer's self-attention
            # REPLACES the queries (skip_first_layer_pe), later layers add a
            # PE-augmented residual.
            if i == 0:
                queries = L["self_attn"](queries, queries, queries)
            else:
                qp = queries + tokens
                queries = queries + L["self_attn"](qp, qp, queries)
            queries = L["norm1"](queries)
            qp = queries + tokens
            kp = keys + pos
            queries = L["norm2"](queries + L["cross_t2i"](qp, kp, keys))
            mlp = L["mlp2"](nn.relu(L["mlp1"](queries)))
            queries = L["norm3"](queries + mlp)
            qp = queries + tokens  # recomputed with post-MLP queries
            keys = L["norm4"](keys + L["cross_i2t"](kp, qp, queries))

        qp = queries + tokens
        kp = keys + pos
        queries = self.norm_final(queries + self.final_attn(qp, kp, keys))

        iou_out = queries[:, 0]
        n_tok = self.num_multimask + 1 + (1 if self.hq else 0)
        mask_toks = queries[:, 1 : 1 + n_tok]

        img = keys.reshape(n, h, w, self.embed_dim)
        up = self.upscale_conv1(img)
        up = nn.gelu(self.upscale_norm(up), approximate=False)
        up = nn.gelu(self.upscale_conv2(up), approximate=False)  # (N, 4h, 4w, C/8)

        hypers = []
        for i, mlps in enumerate(self.hyper_mlps):
            t = mask_toks[:, i]
            t = nn.relu(mlps[0](t))
            t = nn.relu(mlps[1](t))
            hypers.append(mlps[2](t))
        hyper = jnp.stack(hypers, axis=1)  # (N, n_masks, C/8)
        masks = jnp.einsum("nmc,nhwc->nmhw", hyper, up)
        if self.hq:
            # the HQ mask reads the embedding_maskfeature-refined SAM plane
            # plus the fused global-local plane; SAM masks are untouched
            up_hq = self.mask_conv1(up)
            up_hq = self.mask_conv2(nn.gelu(self.mask_norm(up_hq), approximate=False))
            up_hq = up_hq + hq_feat
            t = mask_toks[:, n_tok - 1]
            t = nn.relu(self.hf_mlp[0](t))
            t = nn.relu(self.hf_mlp[1](t))
            hq_hyper = self.hf_mlp[2](t)  # (N, C/8)
            hq_mask = jnp.einsum("nc,nhwc->nhw", hq_hyper, up_hq)
            masks = jnp.concatenate([masks, hq_mask[:, None]], axis=1)

        x = iou_out
        x = nn.relu(self.iou_mlp[0](x))
        x = nn.relu(self.iou_mlp[1](x))
        iou_pred = self.iou_mlp[2](x)
        return masks, iou_pred


class Sam(nn.Module):
    """Full SAM: encoder + prompt encoder + decoder (ViT-B by default).

    ``hq=True`` builds SAM-HQ (the variant the reference actually loads:
    `sam-hq/sam_hq_vit_b.pth`, generate_ground_segmentations.py:11-18,
    in-loop use roi_heads.py:993-1011): the decoder gains the HQ output
    token and the early/final ViT feature fusion, and box decoding returns
    the reference's default `hq_token_only=False` combination
    (SAM mask + HQ correction, sam-hq modeling/sam.py forward)."""

    encoder_dim: int = 768
    encoder_depth: int = 12
    encoder_heads: int = 12
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    img_size: int = 1024
    hq: bool = False
    # "vit" = ImageEncoderViT (vit_b geometry by default); "vit_tiny" =
    # the TinyViT-5M encoder of the reference's fallback checkpoint
    # sam_hq_vit_tiny.pth (generate_ground_segmentations.py:14-18)
    encoder_type: str = "vit"
    dtype: Any = jnp.float32

    def setup(self):
        if self.encoder_type == "vit_tiny":
            from .tinyvit import TinyViT

            self.image_encoder = TinyViT(img_size=self.img_size, dtype=self.dtype)
        else:
            self.image_encoder = ImageEncoderViT(
                img_size=self.img_size, dim=self.encoder_dim, depth=self.encoder_depth,
                num_heads=self.encoder_heads, global_attn_indexes=self.global_attn_indexes,
                dtype=self.dtype,
            )
        grid = self.img_size // 16
        self.prompt_encoder = PromptEncoder(
            image_embedding_size=(grid, grid), input_image_size=(self.img_size, self.img_size)
        )
        # HQ early/final fusion dimension: the ViT hidden dim, or TinyViT's
        # stage-2 width (160) — the Light HQ-SAM tap (reconstructed; see
        # models/tinyvit.py docstring)
        vit_dim = 160 if self.encoder_type == "vit_tiny" else self.encoder_dim
        self.mask_decoder = MaskDecoder(hq=self.hq, vit_dim=vit_dim)

    def encode_image(self, x):
        """Returns the (1, h, w, 256) embedding; in HQ mode a tuple of
        (embedding, early-ViT feature) — both are decoder inputs."""
        if self.hq:
            return self.image_encoder(x, return_interm=True)
        return self.image_encoder(x)

    def decode_boxes(
        self,
        image_embed,
        boxes,
        multimask_output: bool = False,
        hq_token_only: bool = False,
    ):
        """image_embed: (1, h, w, C), or ((1,h,w,C), (1,h,w,vit_dim)) in HQ
        mode (the `encode_image` output); boxes (N, 4) model-input pixels.

        Returns mask logits (N, 4h, 4w). In HQ mode: SAM mask + HQ
        correction (hq_token_only=False default, like the reference's
        `self.segmentor(batched_input, multimask_output=False)` call)."""
        vit_feat = None
        if self.hq:
            image_embed, vit_feat = image_embed
        sparse = self.prompt_encoder.encode_boxes(boxes)
        dense_pe = self.prompt_encoder.dense_pe()
        n = boxes.shape[0]
        # src = image_embeddings + dense prompt embeddings; with no mask
        # prompt the dense embedding is no_mask_embed broadcast over the grid
        # (official mask_decoder.predict_masks / prompt_encoder forward)
        img = image_embed + self.prompt_encoder.no_mask_embed[0]
        img = jnp.broadcast_to(img, (n,) + image_embed.shape[1:])
        hq_feat = None
        if self.hq:
            # fused from the RAW embedding (pre no_mask_embed), once per image
            hq_feat = self.mask_decoder.hq_features(image_embed, vit_feat)
        masks, iou_pred = self.mask_decoder(img, dense_pe, sparse, hq_feat)
        if multimask_output:
            best = jnp.argmax(iou_pred[:, 1:], axis=1) + 1
            sam_mask = jnp.take_along_axis(masks, best[:, None, None, None], axis=1)[:, 0]
        else:
            sam_mask = masks[:, 0]
        if not self.hq:
            return sam_mask
        hq_mask = masks[:, -1]
        return hq_mask if hq_token_only else sam_mask + hq_mask

    def __call__(self, x, boxes):
        emb = self.encode_image(x)
        return self.decode_boxes(emb, boxes)


SAM_MEAN = (123.675, 116.28, 103.53)
SAM_STD = (58.395, 57.12, 57.375)


def preprocess_sam_image(img_rgb: jnp.ndarray, img_size: int = 1024):
    """(H, W, 3) uint8-range RGB -> padded (1, S, S, 3) + scale used."""
    h, w = img_rgb.shape[:2]
    scale = img_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = jax.image.resize(img_rgb.astype(jnp.float32), (nh, nw, 3), method="linear")
    x = (x - jnp.asarray(SAM_MEAN)) / jnp.asarray(SAM_STD)
    out = jnp.zeros((img_size, img_size, 3), jnp.float32).at[:nh, :nw].set(x)
    return out[None], scale
