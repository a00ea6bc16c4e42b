"""Multi-scale deformable attention (MSDeformAttn) for TPU.

GroundingDINO's CUDA kernel (the submodule's ms_deform_attn op, invoked via
cubercnn/data/generate_ground_segmentations.py's detector) re-expressed as
static-shape XLA: per level, the P sampling points per head become 4-tap
bilinear gathers over the flattened value map with zero padding outside —
one fused take_along_axis per corner, no dynamic shapes.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def ms_deform_sample(
    value: jnp.ndarray,               # (B, S, H, D) flattened multi-scale values
    spatial_shapes: Sequence[Tuple[int, int]],
    locations: jnp.ndarray,           # (B, Lq, H, L, P, 2) normalized [0,1]
    weights: jnp.ndarray,             # (B, Lq, H, L, P) softmaxed
) -> jnp.ndarray:
    """Returns (B, Lq, H, D)."""
    b, _, h, d = value.shape
    lq = locations.shape[1]
    out = jnp.zeros((b, lq, h, d), value.dtype)
    offset = 0
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        v = value[:, offset : offset + hl * wl]            # (B, S_l, H, D)
        offset += hl * wl
        vv = v.transpose(0, 2, 1, 3)                       # (B, H, S_l, D)
        loc = locations[:, :, :, lvl]                      # (B, Lq, H, P, 2)
        w = weights[:, :, :, lvl]                          # (B, Lq, H, P)
        # grid_sample(align_corners=False) pixel coords
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        acc = jnp.zeros((b, lq, h, loc.shape[3], d), value.dtype)
        for dy, dx, tap_w in (
            (0, 0, (1 - fy) * (1 - fx)),
            (0, 1, (1 - fy) * fx),
            (1, 0, fy * (1 - fx)),
            (1, 1, fy * fx),
        ):
            xi = x0 + dx
            yi = y0 + dy
            ok = (xi >= 0) & (xi < wl) & (yi >= 0) & (yi < hl)
            idx = (
                jnp.clip(yi, 0, hl - 1).astype(jnp.int32) * wl
                + jnp.clip(xi, 0, wl - 1).astype(jnp.int32)
            )                                              # (B, Lq, H, P)
            flat = idx.transpose(0, 2, 1, 3).reshape(b, h, -1)
            g = jnp.take_along_axis(vv, flat[..., None], axis=2)
            g = g.reshape(b, h, lq, loc.shape[3], d).transpose(0, 2, 1, 3, 4)
            acc = acc + g * (tap_w * ok[..., None]).astype(value.dtype)
        out = out + jnp.sum(acc * w[..., None].astype(value.dtype), axis=3)
    return out


class MSDeformAttn(nn.Module):
    dim: int = 256
    heads: int = 8
    levels: int = 4
    points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,                 # (B, Lq, C)
        ref_points,            # (B, Lq, L, 2) or (B, Lq, L, 4) normalized
        value,                 # (B, S, C)
        spatial_shapes,        # static [(H_l, W_l)] * L
        value_mask=None,       # (B, S) bool
    ):
        b, lq, c = query.shape
        h, L, p = self.heads, self.levels, self.points
        v = nn.Dense(c, dtype=self.dtype, name="value_proj")(value)
        if value_mask is not None:
            v = v * value_mask[..., None].astype(v.dtype)
        v = v.reshape(b, -1, h, c // h)

        off = nn.Dense(h * L * p * 2, dtype=self.dtype, name="sampling_offsets")(query)
        off = off.reshape(b, lq, h, L, p, 2)
        aw = nn.Dense(h * L * p, dtype=self.dtype, name="attention_weights")(query)
        aw = jax.nn.softmax(aw.reshape(b, lq, h, L * p), axis=-1).reshape(b, lq, h, L, p)

        if ref_points.shape[-1] == 2:
            norm = jnp.asarray([[wl, hl] for hl, wl in spatial_shapes], off.dtype)
            loc = ref_points[:, :, None, :, None, :] + off / norm[None, None, None, :, None, :]
        else:
            xy = ref_points[..., :2][:, :, None, :, None, :]
            wh = ref_points[..., 2:][:, :, None, :, None, :]
            loc = xy + off / p * wh * 0.5
        sampled = ms_deform_sample(v, spatial_shapes, loc, aw)  # (B, Lq, H, D)
        out = sampled.reshape(b, lq, c)
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(out)
