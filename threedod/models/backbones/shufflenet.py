"""ShuffleNet-V2 x1.0 backbone (torchvision topology) in flax.

Parity target: cubercnn/modeling/backbone/shufflenet.py:46 — torchvision
shufflenet_v2_x1_0 stages as p2..p5, p6 = stride-2 maxpool.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN, max_pool


def channel_shuffle(x, groups: int = 2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class ShuffleUnit(nn.Module):
    features: int  # total output channels
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.features // 2
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            branch = ConvBN(half, 1, dtype=self.dtype, name="b2_conv1")(x2, train)
            branch = ConvBN(half, 3, 1, groups=half, relu=False, dtype=self.dtype, name="b2_dw")(branch, train)
            branch = ConvBN(half, 1, dtype=self.dtype, name="b2_conv2")(branch, train)
            out = jnp.concatenate([x1, branch], axis=-1)
        else:
            left = ConvBN(x.shape[-1], 3, self.stride, groups=x.shape[-1], relu=False, dtype=self.dtype, name="b1_dw")(x, train)
            left = ConvBN(half, 1, dtype=self.dtype, name="b1_conv")(left, train)
            right = ConvBN(half, 1, dtype=self.dtype, name="b2_conv1")(x, train)
            right = ConvBN(half, 3, self.stride, groups=half, relu=False, dtype=self.dtype, name="b2_dw")(right, train)
            right = ConvBN(half, 1, dtype=self.dtype, name="b2_conv2")(right, train)
            out = jnp.concatenate([left, right], axis=-1)
        return channel_shuffle(out)


class ShuffleNetV2(nn.Module):
    stage_channels = (116, 232, 464)
    stage_repeats = (4, 8, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(24, 3, 2, dtype=self.dtype, name="stem")(x, train)
        outs = {"p2": x}  # stride 4 after maxpool below
        x = max_pool(x, 3, 2, padding=1)
        outs["p2"] = x
        for si, (c, n) in enumerate(zip(self.stage_channels, self.stage_repeats)):
            for bi in range(n):
                x = ShuffleUnit(c, 2 if bi == 0 else 1, dtype=self.dtype, name=f"stage{si + 2}_{bi}")(x, train)
            outs[f"p{si + 3}"] = x
        # reference shufflenet.py:27-35: p5 = stage4 output (464 ch); the
        # torchvision conv5 is assigned but never used in the forward
        outs["p6"] = max_pool(x, 1, 2)
        return outs


def build_shufflenet(name: str = "shufflenet", dtype=jnp.float32) -> ShuffleNetV2:
    return ShuffleNetV2(dtype=dtype)
