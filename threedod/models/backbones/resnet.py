"""ResNet backbones (18/34/50/101, torchvision topology) in flax.

Parity target: cubercnn/modeling/backbone/resnet.py:12-110 — torchvision
resnets re-exposed as 5-level feature extractors
{p2: s4, p3: s8, p4: s16, p5: s32, p6: s64 (stride-2 maxpool of p5)}.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .block_conv import block_maxpool_3x3_s2, space_to_depth
from .dla import block_convbn
from .layers import ConvBN, ConvBNParams, fold_convbn, max_pool
from ...ops import fused_conv


class ResBasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (
            not train
            and self.stride == 1
            and not self.downsample
            and x.shape[-1] == self.features
            and fused_conv.fused_conv_available()
        ):
            # Eval fast path: one Pallas kernel, intermediate stays in VMEM
            # (ops/fused_conv.py); identical variable tree (conv1/conv2).
            ht = fused_conv.fuse_tile(
                "bb", x.shape[1], x.shape[2], self.features, self.features
            )
            if ht is not None:
                w1, b1 = fold_convbn(*ConvBNParams(self.features, 3, x.shape[-1], name="conv1")())
                w2, b2 = fold_convbn(*ConvBNParams(self.features, 3, self.features, name="conv2")())
                return fused_conv.fused_basic_block(
                    x.astype(self.dtype), w1, b1, w2, b2,
                    ht=ht, interpret=fused_conv.kernel_interpret(),
                )
        if (
            not train
            and self.stride == 2
            and self.downsample
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
            and fused_conv.fused_conv_available()
        ):
            # stride-2 head: conv1-s2 -> conv2 -> + downsample(x), one kernel;
            # torchvision downsample is a 1x1 stride-2 conv (= x[::2, ::2] @ w)
            ht = fused_conv.fuse_tile(
                "bd", x.shape[1] // 2, x.shape[2] // 2, x.shape[-1],
                self.features, False
            )
            if ht is not None:
                w1, b1 = fold_convbn(*ConvBNParams(self.features, 3, x.shape[-1], name="conv1")())
                w2, b2 = fold_convbn(*ConvBNParams(self.features, 3, self.features, name="conv2")())
                wd, bd = fold_convbn(*ConvBNParams(self.features, 1, x.shape[-1], name="downsample")())
                return fused_conv.fused_block_down(
                    x.astype(self.dtype), w1, b1, w2, b2, wd, bd,
                    pool_residual=False, ht=ht,
                    interpret=fused_conv.kernel_interpret(),
                )
        identity = x
        out = ConvBN(self.features, 3, self.stride, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(self.features, 3, 1, relu=False, dtype=self.dtype, name="conv2")(out, train)
        if self.downsample:
            identity = ConvBN(self.features, 1, self.stride, relu=False, dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + identity)


class ResBottleneck(nn.Module):
    features: int  # output channels (= planes * 4)
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        planes = self.features // 4
        out = ConvBN(planes, 1, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(planes, 3, self.stride, dtype=self.dtype, name="conv2")(out, train)
        out = ConvBN(self.features, 1, relu=False, dtype=self.dtype, name="conv3")(out, train)
        if self.downsample:
            identity = ConvBN(self.features, 1, self.stride, relu=False, dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """torchvision-topology ResNet trunk.

    fast_stem: when the input is 4-divisible, the 7x7 s2 stem runs as a b=4
    space-to-depth block conv (b_out=2; numerically identical rearranged
    kernel — see block_conv.py) and the 3x3 s2 maxpool reduces the block
    layout directly, so the stride-2 tensor never materialises in native
    small-channel layout. Same variable tree as the native path.
    Default OFF: measured NEUTRAL on v5e (trunk 5.9 vs 6.0 ms, bs8 512x672
    bf16, back-to-back) — unlike DLA, ResNet has no full-resolution
    small-channel stages; its single stride-2 stem conv is already
    MXU-efficient under stock XLA. Kept (equivalence-tested both modes)
    for input regimes where the stem share is larger."""

    block_counts: Tuple[int, int, int, int]
    bottleneck: bool = False
    dtype: Any = jnp.float32
    fast_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = 4 if self.bottleneck else 1
        blk = ResBottleneck if self.bottleneck else ResBasicBlock

        if self.fast_stem and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
            y = space_to_depth(x.astype(self.dtype), 4)
            y = block_convbn(
                ConvBNParams(64, 7, 3, name="stem"), y, 3, 2, 4, 2, train, self.dtype
            )
            x = block_maxpool_3x3_s2(y)
        else:
            x = ConvBN(64, 7, 2, dtype=self.dtype, name="stem")(x, train)
            x = max_pool(x, 3, 2, padding=1)

        outs = {}
        feats = [64 * width, 128 * width, 256 * width, 512 * width]
        for stage, (n_blocks, f) in enumerate(zip(self.block_counts, feats)):
            stride = 1 if stage == 0 else 2
            for i in range(n_blocks):
                s = stride if i == 0 else 1
                down = i == 0 and (s != 1 or stage == 0 and self.bottleneck)
                x = blk(f, s, down, dtype=self.dtype, name=f"layer{stage + 1}_{i}")(x, train)
            outs[f"p{stage + 2}"] = x
        outs["p6"] = max_pool(x, 1, 2)
        return outs


_RESNET_SPECS = {
    "resnet18": dict(block_counts=(2, 2, 2, 2), bottleneck=False),
    "resnet34": dict(block_counts=(3, 4, 6, 3), bottleneck=False),
    "resnet50": dict(block_counts=(3, 4, 6, 3), bottleneck=True),
    "resnet101": dict(block_counts=(3, 4, 23, 3), bottleneck=True),
}


def build_resnet(name: str, dtype=jnp.float32) -> ResNet:
    spec = _RESNET_SPECS[name]
    return ResNet(block_counts=spec["block_counts"], bottleneck=spec["bottleneck"], dtype=dtype)
