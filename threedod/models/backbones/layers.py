"""Shared conv/norm building blocks (flax.linen, NHWC, bf16-friendly).

Params stay float32; compute dtype is configurable per model (bfloat16 by
default on TPU so convs hit the MXU at full rate).
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm [+ ReLU]."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x.astype(self.dtype)


def max_pool(x, window: int, stride: int, padding: int = 0):
    return nn.max_pool(
        x,
        (window, window),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
    )
