"""Feature Pyramid Network over a 5-level bottom-up dict.

Parity target: detectron2 FPN as configured by the reference
(build_dla_from_vision_fpn_backbone, dla.py:484-507): lateral 1x1 + output
3x3 convs, nearest top-down upsampling, sum fusion, all levels p2..p6 fed
from the bottom-up (p6 comes from the trunk's stride-2 maxpool, no extra
top block).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import fused_conv
from .layers import ConvWithBiasParams


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bottom_up: dict, train: bool = False):
        names = sorted(bottom_up.keys())  # ['p2', ..., 'p6']
        fuse = not train and fused_conv.fused_conv_available()
        outs = {}
        prev = None
        for n in reversed(names):
            f = bottom_up[n]
            emit = n != names[0]
            ht = (
                fused_conv.fuse_tile(
                    "fpn", f.shape[1], f.shape[2], f.shape[-1],
                    self.out_channels, emit,
                )
                if fuse
                else None
            )
            if ht is not None and prev is not None:
                # Eval fast path (ops/fused_conv.py): lateral + nearest-up
                # add + output conv in one kernel; the lateral and summed
                # carry never round-trip HBM. Identical parameter tree.
                cl = f.shape[-1]
                wl, bl = ConvWithBiasParams((1, 1, cl, self.out_channels), name=f"lateral_{n}")()
                wo, bo = ConvWithBiasParams(
                    (3, 3, self.out_channels, self.out_channels), name=f"output_{n}"
                )()
                res = fused_conv.fused_fpn_level(
                    f.astype(self.dtype), prev.astype(self.dtype), wl, bl, wo, bo,
                    emit_cur=emit, ht=ht,
                    interpret=fused_conv.kernel_interpret(),
                )
                if emit:
                    outs[n], prev = res
                else:
                    outs[n] = res
                continue
            cur = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral_{n}"
            )(f)
            if prev is not None:
                h, w = cur.shape[-3], cur.shape[-2]
                up = jax.image.resize(
                    prev, prev.shape[:-3] + (h, w, prev.shape[-1]), method="nearest"
                )
                cur = cur + up
            prev = cur
            outs[n] = nn.Conv(
                self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name=f"output_{n}"
            )(cur)
        return outs


class BackboneWithFPN(nn.Module):
    """Bottom-up trunk + FPN; the standard backbone for all meta-archs."""

    trunk: nn.Module
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.trunk(x, train=train)
        return FPN(self.out_channels, dtype=self.dtype, name="fpn")(feats, train=train)


STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
