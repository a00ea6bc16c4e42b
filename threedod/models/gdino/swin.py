"""Swin Transformer backbone (Swin-T) in flax for GroundingDINO.

The reference consumes GroundingDINO as a git submodule (``.gitmodules:1-3``,
invoked from cubercnn/data/generate_ground_segmentations.py:137-164); its
image backbone is Swin-T (patch 4, embed 96, depths (2,2,6,2), heads
(3,6,12,24), window 7), tapped at stages 1-3 (strides 8/16/32).

TPU notes: window partition/shift masks are computed at trace time from the
static padded resolution; attention runs as plain batched MXU matmuls over
(num_windows*B, 49, C) blocks.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _rel_pos_index_jnp(ws: int) -> jnp.ndarray:
    """Traced (ws², ws²) relative-position index — identical values to
    `_rel_pos_index` but built from iota so it lowers as a few ops instead
    of an inline dense constant (12 of these plus the shifted-window masks
    put the lowered GDINO program at 27.5 MB, which the axon relay's
    remote_compile rejects with HTTP 413)."""
    ar = jnp.arange(ws, dtype=jnp.int32)
    coords = jnp.stack(jnp.meshgrid(ar, ar, indexing="ij")).reshape(2, -1)  # (2, ws²)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, ws², ws²)
    rel = rel + (ws - 1)
    return rel[0] * (2 * ws - 1) + rel[1]


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)  # (ws², ws²)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (nW*B, N, C); mask: (nW, N, N) or None
        b, n, c = x.shape
        h = self.heads
        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, c // h).transpose(2, 0, 3, 1, 4), 3)
        q, k, v = q[0], k[0], v[0]  # (B, h, N, hd)
        scale = (c // h) ** -0.5
        attn = (q * scale) @ k.transpose(0, 1, 3, 2)  # (B, h, N, N)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        idx = _rel_pos_index_jnp(self.window)
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, h, n, n) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        # x: (B, H*W, C)
        H, W = hw
        b, _, c = x.shape
        ws = self.window
        shortcut = x
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x.reshape(b, H, W, c)

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        shift = self.shift if min(Hp, Wp) > ws else 0
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            # attention mask for the shifted partition, built TRACED from
            # iota region labels (values identical to the classic
            # slice-loop construction): region 0 = [0, Hp-ws), 1 =
            # [Hp-ws, Hp-shift), 2 = [Hp-shift, Hp). An (nW, ws², ws²)
            # dense constant here is multi-MB of inline HLO per block —
            # the relay's remote_compile rejects the program (HTTP 413).
            def regions(n_total):
                i = jnp.arange(n_total, dtype=jnp.int32)
                return (i >= n_total - ws).astype(jnp.int32) + (
                    i >= n_total - shift
                ).astype(jnp.int32)

            img_mask = regions(Hp)[:, None] * 3 + regions(Wp)[None, :]
            wm = img_mask.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3)
            wm = wm.reshape(-1, ws * ws)
            mask = jnp.where(wm[:, :, None] != wm[:, None, :], -100.0, 0.0)
        else:
            mask = None

        # window partition
        xw = x.reshape(b, Hp // ws, ws, Wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(-1, ws * ws, c)
        xw = WindowAttention(self.dim, self.heads, ws, dtype=self.dtype, name="attn")(xw, mask)
        x = xw.reshape(b, Hp // ws, Wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, Hp, Wp, c)

        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :H, :W].reshape(b, H * W, c)
        x = shortcut + x

        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        H, W = hw
        b, _, c = x.shape
        x = x.reshape(b, H, W, c)
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        Hh, Wh = (H + 1) // 2, (W + 1) // 2
        x = x.reshape(b, Hh * Wh, 4 * c)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        x = nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x, (Hh, Wh)


class SwinT(nn.Module):
    """Swin-T trunk; returns {p3: s8, p4: s16, p5: s32} NHWC maps."""

    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, H0, W0, _ = x.shape
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype, name="patch_embed")(x)
        H, W = x.shape[1], x.shape[2]
        x = x.reshape(b, H * W, self.embed_dim)
        x = nn.LayerNorm(dtype=jnp.float32, name="patch_norm")(x).astype(self.dtype)

        outs = {}
        dim = self.embed_dim
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock(
                    dim,
                    self.heads[si],
                    self.window,
                    shift=0 if bi % 2 == 0 else self.window // 2,
                    dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(x, (H, W))
            if si in self.out_indices:
                y = nn.LayerNorm(dtype=jnp.float32, name=f"out_norm{si}")(x)
                outs[f"p{si + 2}"] = y.reshape(b, H, W, dim).astype(self.dtype)
            if si != len(self.depths) - 1:
                x, (H, W) = PatchMerging(dim, dtype=self.dtype, name=f"downsample{si}")(x, (H, W))
                dim *= 2
        return outs
