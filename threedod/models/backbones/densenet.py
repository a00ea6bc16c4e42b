"""DenseNet-121 backbone (torchvision topology) in flax.

Parity target: cubercnn/modeling/backbone/densenet.py:41 — torchvision
densenet121 re-exposed as a 5-level extractor. Level taps follow the
reference: features up to each transition give p2..p5 (the reference taps
denseblock outputs before transition downsampling), p6 = stride-2 maxpool.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .block_conv import block_maxpool_3x3_s2, space_to_depth
from .dla import block_convbn
from .layers import ConvBN, ConvBNParams, max_pool


class DenseLayer(nn.Module):
    growth: int = 32
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="norm1")(x)
        out = nn.relu(out).astype(self.dtype)
        out = nn.Conv(self.bn_size * self.growth, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(out)
        out = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="norm2")(out)
        out = nn.relu(out).astype(self.dtype)
        out = nn.Conv(self.growth, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="conv2")(out)
        return jnp.concatenate([x, out], axis=-1)


class DenseNet(nn.Module):
    block_counts: Tuple[int, ...] = (6, 12, 24, 16)
    growth: int = 32
    init_features: int = 64
    dtype: Any = jnp.float32
    # 7x7 s2 stem as a b=4 space-to-depth block conv + block-layout maxpool
    # (exact; same scheme as ResNet/DLA — see block_conv.py). Default OFF:
    # the identical ResNet stem measured neutral on v5e (resnet.py note).
    fast_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fast_stem and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
            y = space_to_depth(x.astype(self.dtype), 4)
            y = block_convbn(
                ConvBNParams(self.init_features, 7, 3, name="stem"), y, 3, 2, 4, 2,
                train, self.dtype,
            )
            x = block_maxpool_3x3_s2(y)
        else:
            x = ConvBN(self.init_features, 7, 2, dtype=self.dtype, name="stem")(x, train)
            x = max_pool(x, 3, 2, padding=1)
        outs = {}
        features = self.init_features
        for bi, n_layers in enumerate(self.block_counts):
            for li in range(n_layers):
                x = DenseLayer(self.growth, dtype=self.dtype, name=f"block{bi + 1}_layer{li + 1}")(x, train)
            features += n_layers * self.growth
            outs[f"p{bi + 2}"] = x
            if bi != len(self.block_counts) - 1:
                # transition: 1x1 conv halving channels + 2x avg pool
                features = features // 2
                x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name=f"trans{bi + 1}_norm")(x)
                x = nn.relu(x).astype(self.dtype)
                x = nn.Conv(features, (1, 1), use_bias=False, dtype=self.dtype, name=f"trans{bi + 1}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        # reference densenet.py:29: p5 = features[9:] which ends with the
        # final norm5 BatchNorm (no relu — that lives outside `features`)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="norm5")(x)
        outs["p5"] = x.astype(self.dtype)
        outs["p6"] = max_pool(outs["p5"], 1, 2)
        return outs


def build_densenet(name: str = "densenet121", dtype=jnp.float32) -> DenseNet:
    specs = {"densenet121": (6, 12, 24, 16), "densenet169": (6, 12, 32, 32)}
    return DenseNet(block_counts=specs[name], dtype=dtype)
