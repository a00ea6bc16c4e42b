"""MNASNet-1.0 backbone (torchvision topology) in flax.

Parity target: cubercnn/modeling/backbone/mnasnet.py:40 — torchvision
mnasnet1_0 layers re-tapped at strides 4/8/16/32 as p2..p5, p6 = maxpool.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN, max_pool


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expansion: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expansion
        out = ConvBN(mid, 1, dtype=self.dtype, name="expand")(x, train)
        out = ConvBN(mid, self.kernel, self.stride, groups=mid, dtype=self.dtype, name="depthwise")(out, train)
        out = ConvBN(self.features, 1, relu=False, dtype=self.dtype, name="project")(out, train)
        if self.stride == 1 and in_ch == self.features:
            out = out + x
        return out


class MNASNet(nn.Module):
    """MNASNet 1.0: stem + 6 inverted-residual stages."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBN(32, 3, 2, dtype=d, name="stem0")(x, train)
        x = ConvBN(32, 3, 1, groups=32, dtype=d, name="stem1")(x, train)
        x = ConvBN(16, 1, relu=False, dtype=d, name="stem2")(x, train)

        # (features, n_blocks, stride, expansion, kernel)
        stages = [
            (24, 3, 2, 3, 3),
            (40, 3, 2, 3, 5),
            (80, 3, 2, 6, 5),
            (96, 2, 1, 6, 3),
            (192, 4, 2, 6, 5),
            (320, 1, 1, 6, 3),
        ]
        outs = {}
        taps = {0: "p2", 1: "p3", 3: "p4", 5: "p5"}  # after these stage idxs
        for si, (f, n, s, e, k) in enumerate(stages):
            for bi in range(n):
                x = InvertedResidual(
                    f, s if bi == 0 else 1, e, k, dtype=d, name=f"stage{si}_{bi}"
                )(x, train)
            if si in taps:
                outs[taps[si]] = x
        outs["p6"] = max_pool(outs["p5"], 1, 2)
        return outs


def build_mnasnet(name: str = "mnasnet", dtype=jnp.float32) -> MNASNet:
    return MNASNet(dtype=dtype)
