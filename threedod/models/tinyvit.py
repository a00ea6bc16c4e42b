"""TinyViT-5M image encoder (MobileSAM / Light HQ-SAM geometry) for TPU.

Parity target: the `vit_tiny` fallback of the reference's mask pipeline —
`/root/reference/cubercnn/data/generate_ground_segmentations.py:14-18` loads
`sam-hq/sam_hq_vit_tiny.pth` via `sam_model_registry["vit_tiny"]`, whose
image encoder is the TinyViT-5M of MobileSAM (embed dims 64/128/160/320,
depths 2/2/6/2, heads 2/4/5/10, windows 7/7/14/7) ending in the SAM neck
(two convs + LayerNorm2d to 256 channels at 64x64 for a 1024px input).
No source or weights ship in this image, so the architecture is built from
the TinyViT paper/MobileSAM description and validated against our own
exact-naming torch stand-in (tests/_tinyvit_ref.py), the same pattern as
the GDINO and SAM-HQ ports.

TPU notes: everything is NHWC with static shapes; Conv2d_BN pairs are
folded into biased convs at conversion time (inference-only encoder, like
the reference's frozen segmentor); window partition pads to static window
multiples; the LeViT-style attention biases are gathered from the (small)
learned offset table once at trace time.

MobileSAM quirk kept: the LAST PatchMerging (160->320) uses stride 1, so
stages 2 and 3 both run at 64x64 and the final embedding is 1024/16.
"""
from __future__ import annotations

import itertools
from typing import Any, Sequence, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn


def _gelu(x):
    return nn.gelu(x, approximate=False)


class ConvBN(nn.Module):
    """Conv2d_BN with the BN folded into a biased conv (inference form)."""

    feats: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        return nn.Conv(
            self.feats, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], feature_group_count=self.groups,
            use_bias=True, dtype=self.dtype, name="conv",
        )(x)


class MBConv(nn.Module):
    """TinyViT conv-stage block: 1x1 expand -> 3x3 depthwise -> 1x1 project,
    GELU between, residual add, trailing GELU."""

    dim: int
    expand: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expand)
        h = _gelu(ConvBN(hidden, 1, dtype=self.dtype, name="conv1")(x))
        h = _gelu(ConvBN(hidden, 3, groups=hidden, dtype=self.dtype, name="conv2")(h))
        h = ConvBN(self.dim, 1, dtype=self.dtype, name="conv3")(h)
        return _gelu(x + h)


class PatchMerging(nn.Module):
    """1x1 expand -> 3x3 depthwise (stride 2, or 1 for the 320-dim merge)
    -> 1x1, GELU between the convs."""

    out_dim: int
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _gelu(ConvBN(self.out_dim, 1, dtype=self.dtype, name="conv1")(x))
        h = _gelu(ConvBN(
            self.out_dim, 3, stride=self.stride, groups=self.out_dim,
            dtype=self.dtype, name="conv2",
        )(h))
        return ConvBN(self.out_dim, 1, dtype=self.dtype, name="conv3")(h)


def _bias_idxs(ws: int) -> np.ndarray:
    """LeViT attention-bias index table: idxs[i, j] = offset id of
    (|dy|, |dx|) between window positions i and j (N = ws*ws)."""
    points = list(itertools.product(range(ws), range(ws)))
    offsets: dict = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return np.asarray(idxs, np.int32).reshape(len(points), len(points))


class WindowAttention(nn.Module):
    """TinyViT attention (attn_ratio=1): LN inside, qkv linear, learned
    per-|offset| bias table added to the logits."""

    dim: int
    heads: int
    ws: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):              # (B*, N, C) with N = ws*ws
        key_dim = self.dim // self.heads
        n = self.ws * self.ws
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(x.shape[0], n, self.heads, 3 * key_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        idxs = _bias_idxs(self.ws)
        table = self.param(
            "attention_biases",
            nn.initializers.zeros,
            (self.heads, int(idxs.max()) + 1),
        )
        bias = table[:, idxs]           # (heads, N, N)
        attn = (q @ k.transpose(0, 1, 3, 2)) * (key_dim ** -0.5)
        attn = attn + bias[None].astype(attn.dtype)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(x.shape[0], n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TinyViTBlock(nn.Module):
    dim: int
    heads: int
    ws: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):              # (B, H, W, C)
        b, hh, ww, c = x.shape
        res = x
        if hh == self.ws and ww == self.ws:
            a = WindowAttention(self.dim, self.heads, self.ws, dtype=self.dtype, name="attn")(
                x.reshape(b, hh * ww, c)
            ).reshape(b, hh, ww, c)
        else:
            pad_b = (self.ws - hh % self.ws) % self.ws
            pad_r = (self.ws - ww % self.ws) % self.ws
            xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            ph, pw = hh + pad_b, ww + pad_r
            nh, nw = ph // self.ws, pw // self.ws
            wnd = (
                xp.reshape(b, nh, self.ws, nw, self.ws, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b * nh * nw, self.ws * self.ws, c)
            )
            a = WindowAttention(self.dim, self.heads, self.ws, dtype=self.dtype, name="attn")(wnd)
            a = (
                a.reshape(b, nh, nw, self.ws, self.ws, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, ph, pw, c)[:, :hh, :ww]
            )
        x = res + a
        x = ConvBN(self.dim, 3, groups=self.dim, dtype=self.dtype, name="local_conv")(x)
        h = nn.LayerNorm(dtype=jnp.float32, name="mlp_norm")(x).astype(self.dtype)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(_gelu(h))
        return x + h


class LayerNorm2dCF(nn.Module):
    """Channels-last LayerNorm over the feature axis (SAM neck norm)."""

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        x = x.astype(jnp.float32)
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-6)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (x * w + b).astype(dt)


class TinyViT(nn.Module):
    """TinyViT-5M SAM image encoder: (B, 1024, 1024, 3) -> (B, 64, 64, 256).

    ``return_interm=True`` additionally returns the stage-2 feature
    (B, 64, 64, 160) — the natural early-feature tap for the HQ decoder's
    vit_dim=160 fusion (reconstruction: Light HQ-SAM's exact tap is not
    verifiable without its source; documented in PARITY.md)."""

    img_size: int = 1024
    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_interm: bool = False):
        d = self.embed_dims
        x = _gelu(ConvBN(d[0] // 2, 3, stride=2, dtype=self.dtype, name="patch_conv1")(x))
        x = ConvBN(d[0], 3, stride=2, dtype=self.dtype, name="patch_conv2")(x)

        # stage 0: MBConv blocks, then merge to d[1] at half resolution
        for j in range(self.depths[0]):
            x = MBConv(d[0], dtype=self.dtype, name=f"layer0_block{j}")(x)
        x = PatchMerging(d[1], stride=2, dtype=self.dtype, name="merge0")(x)

        interm = None
        for i in (1, 2, 3):
            for j in range(self.depths[i]):
                x = TinyViTBlock(
                    d[i], self.num_heads[i], self.window_sizes[i],
                    self.mlp_ratio, dtype=self.dtype, name=f"layer{i}_block{j}",
                )(x)
            if i == 2:
                interm = x
            if i < 3:
                # MobileSAM: the merge to 320 keeps stride 1 so the final
                # grid stays img_size/16
                x = PatchMerging(
                    d[i + 1], stride=2 if i < 2 else 1,
                    dtype=self.dtype, name=f"merge{i}",
                )(x)

        # SAM neck (same two-conv + LayerNorm2d head as ImageEncoderViT)
        x = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(x)
        x = LayerNorm2dCF(name="neck_ln1")(x)
        x = nn.Conv(
            256, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="neck_conv2",
        )(x)
        x = LayerNorm2dCF(name="neck_ln2")(x)
        if return_interm:
            return x, interm
        return x
