"""DINOv2 vision transformer in flax (vits/vitb/vitl).

Parity target: depth/metric_depth/depth_anything_v2/dinov2.py (+
dinov2_layers/): patch 14, img 518, LayerScale init 1.0, plain MLP FFN, no
register tokens; `get_intermediate_layers` returns final-normed
(patch_tokens, cls_token) pairs for the DPT head.

TPU notes: attention runs through jax.nn.dot_product_attention (fused by
XLA onto the MXU); sequence length at 518px is 37*37+1 = 1370 tokens, so no
sequence sharding is needed (SURVEY.md §5.7) — bf16 full attention is the
right shape here.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _cubic_kernel(t, a: float = -0.75):
    """PyTorch's bicubic convolution kernel (a = -0.75)."""
    at = jnp.abs(t)
    return jnp.where(
        at <= 1.0,
        (a + 2) * at**3 - (a + 3) * at**2 + 1,
        jnp.where(at < 2.0, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
    )


def _bicubic_resize_torch(x: jnp.ndarray, out_h: int, out_w: int, scale_y: float, scale_x: float) -> jnp.ndarray:
    """torch F.interpolate(mode='bicubic', align_corners=False) parity.

    x: (B, H, W, C). Source coords: (i + 0.5)/scale - 0.5; border-clamped
    4-tap cubic with a=-0.75.
    """
    b, h, w, c = x.shape

    def axis_weights(out_n, in_n, scale):
        pos = (jnp.arange(out_n) + 0.5) / scale - 0.5
        base = jnp.floor(pos).astype(jnp.int32)
        frac = pos - base
        idx = base[:, None] + jnp.arange(-1, 3)[None, :]  # (out, 4)
        wgt = _cubic_kernel(frac[:, None] - jnp.arange(-1, 3)[None, :])
        idx = jnp.clip(idx, 0, in_n - 1)
        return idx, wgt

    yi, yw = axis_weights(out_h, h, scale_y)
    xi, xw = axis_weights(out_w, w, scale_x)
    # gather rows then cols: (B, out_h, 4, W, C) -> weighted sum
    rows = x[:, yi]  # (B, out_h, 4, W, C)
    rows = jnp.einsum("bofwc,of->bowc", rows, yw)
    cols = rows[:, :, xi]  # (B, out_h, out_w, 4, C)
    return jnp.einsum("bowfc,wf->bowc", cols, xw)


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, c // self.num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        from ...ops.attention import multi_head_attention

        out = multi_head_attention(q, k, v)
        out = out.reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ls1 = self.param("ls1_gamma", nn.initializers.ones, (self.dim,))
        ls2 = self.param("ls2_gamma", nn.initializers.ones, (self.dim,))
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        x = x + ls1 * Attention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        x = x + ls2 * Mlp(self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(h)
        return x


class DinoVisionTransformer(nn.Module):
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    img_size: int = 518
    interpolate_offset: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        grid = self.img_size // self.patch_size
        self.num_patches = grid * grid
        self.patch_proj = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.num_patches + 1, self.embed_dim),
        )
        self.blocks = [
            Block(self.embed_dim, self.num_heads, dtype=self.dtype, name=f"block{i}")
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")

    def _interp_pos(self, h_patches: int, w_patches: int):
        n = self.num_patches
        if h_patches * w_patches == n and h_patches == w_patches:
            return self.pos_embed
        cls_pe = self.pos_embed[:, :1]
        patch_pe = self.pos_embed[:, 1:]
        g = int(math.sqrt(n))
        pe = patch_pe.reshape(1, g, g, self.embed_dim)
        # torch F.interpolate(scale_factor=(h0+0.1)/g, mode='bicubic') parity
        # (dinov2.py:179-210, incl. the 0.1 interpolate_offset workaround)
        sy = (h_patches + self.interpolate_offset) / g
        sx = (w_patches + self.interpolate_offset) / g
        pe = _bicubic_resize_torch(pe, h_patches, w_patches, sy, sx)
        return jnp.concatenate([cls_pe, pe.reshape(1, -1, self.embed_dim)], axis=1)

    def prepare_tokens(self, x):
        """x: (B, H, W, 3) NHWC."""
        b, h, w, _ = x.shape
        t = self.patch_proj(x)  # (B, h/14, w/14, D)
        hp, wp = t.shape[1], t.shape[2]
        t = t.reshape(b, hp * wp, self.embed_dim)
        cls = jnp.broadcast_to(self.cls_token, (b, 1, self.embed_dim)).astype(t.dtype)
        t = jnp.concatenate([cls, t], axis=1)
        return t + self._interp_pos(hp, wp).astype(t.dtype), hp, wp

    def get_intermediate_layers(self, x, layer_ids: Sequence[int]):
        """Returns [(patch_tokens (B,N,D), cls (B,D)), ...] final-normed."""
        t, hp, wp = self.prepare_tokens(x)
        want = set(layer_ids)
        outs = {}
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in want:
                outs[i] = t
        result = []
        for i in layer_ids:
            normed = self.norm(outs[i].astype(jnp.float32))
            result.append((normed[:, 1:], normed[:, 0]))
        return result, hp, wp

    def __call__(self, x, layer_ids: Sequence[int] = (2, 5, 8, 11)):
        return self.get_intermediate_layers(x, layer_ids)


VIT_SPECS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
}

INTERMEDIATE_LAYER_IDX = {
    "vits": (2, 5, 8, 11),
    "vitb": (2, 5, 8, 11),
    "vitl": (4, 11, 17, 23),
}


def build_dinov2(name: str, dtype=jnp.float32) -> DinoVisionTransformer:
    return DinoVisionTransformer(**VIT_SPECS[name], dtype=dtype)
