"""Deep Layer Aggregation backbones (dla34 ... dla169) in flax.

Parity target: cubercnn/modeling/backbone/dla.py — the hierarchical Tree/
Root aggregation topology and the 5-level output contract
{p2: s4, p3: s8, p4: s16, p5: s32, p6: s64 (= stride-2 maxpool of p5)}.
The recursion unrolls at module-construction time, so the compiled graph is
fully static.
"""
from __future__ import annotations

from typing import Any, Tuple, Type

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBN, max_pool


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = ConvBN(self.features, 3, self.stride, self.dilation, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(self.features, 3, 1, self.dilation, relu=False, dtype=self.dtype, name="conv2")(out, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        bottle = self.features // self.expansion
        out = ConvBN(bottle, 1, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(bottle, 3, self.stride, self.dilation, dtype=self.dtype, name="conv2")(out, train)
        out = ConvBN(self.features, 1, relu=False, dtype=self.dtype, name="conv3")(out, train)
        return nn.relu(out + residual)


class BottleneckX(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    cardinality: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        bottle = self.features * self.cardinality // 32
        out = ConvBN(bottle, 1, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(bottle, 3, self.stride, self.dilation, groups=self.cardinality, dtype=self.dtype, name="conv2")(out, train)
        out = ConvBN(self.features, 1, relu=False, dtype=self.dtype, name="conv3")(out, train)
        return nn.relu(out + residual)


class Root(nn.Module):
    features: int
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children, train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = ConvBN(self.features, 1, relu=False, dtype=self.dtype, name="conv")(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    levels: int
    block: Type[nn.Module]
    features: int
    stride: int = 1
    level_root: bool = False
    root_residual: bool = False
    project: bool = False  # in_channels != out_channels
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, children=None, train: bool = False):
        children = [] if children is None else list(children)
        bottom = max_pool(x, self.stride, self.stride) if self.stride > 1 else x
        if self.project:
            residual = ConvBN(self.features, 1, relu=False, dtype=self.dtype, name="project")(bottom, train)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = self.block(self.features, self.stride, dtype=self.dtype, name="tree1")(x, residual, train=train)
            x2 = self.block(self.features, 1, dtype=self.dtype, name="tree2")(x1, train=train)
            out = Root(self.features, self.root_residual, dtype=self.dtype, name="root")([x2, x1] + children, train)
        else:
            x1 = Tree(
                self.levels - 1, self.block, self.features, self.stride,
                root_residual=self.root_residual,
                project=self.project,  # projection tracks channel mismatch only
                dtype=self.dtype, name="tree1",
            )(x, train=train)
            children.append(x1)
            out = Tree(
                self.levels - 1, self.block, self.features, 1,
                root_residual=self.root_residual, project=False,
                dtype=self.dtype, name="tree2",
            )(x1, children=children, train=train)
        return out


class DLA(nn.Module):
    """DLA trunk; returns {'p2': s4 ... 'p6': s64} feature dict."""

    levels: Tuple[int, ...]
    channels: Tuple[int, ...]
    block: Type[nn.Module] = BasicBlock
    residual_root: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        x = ConvBN(ch[0], 7, 1, dtype=self.dtype, name="base_layer")(x, train)
        # level0 / level1: plain conv stages
        for i in range(self.levels[0]):
            x = ConvBN(ch[0], 3, 1, dtype=self.dtype, name=f"level0_{i}")(x, train)
        for i in range(self.levels[1]):
            x = ConvBN(ch[1], 3, 2 if i == 0 else 1, dtype=self.dtype, name=f"level1_{i}")(x, train)

        outs = {}
        x = Tree(self.levels[2], self.block, ch[2], 2, level_root=False,
                 root_residual=self.residual_root, project=ch[1] != ch[2],
                 dtype=self.dtype, name="level2")(x, train=train)
        outs["p2"] = x
        x = Tree(self.levels[3], self.block, ch[3], 2, level_root=True,
                 root_residual=self.residual_root, project=ch[2] != ch[3],
                 dtype=self.dtype, name="level3")(x, train=train)
        outs["p3"] = x
        x = Tree(self.levels[4], self.block, ch[4], 2, level_root=True,
                 root_residual=self.residual_root, project=ch[3] != ch[4],
                 dtype=self.dtype, name="level4")(x, train=train)
        outs["p4"] = x
        x = Tree(self.levels[5], self.block, ch[5], 2, level_root=True,
                 root_residual=self.residual_root, project=ch[4] != ch[5],
                 dtype=self.dtype, name="level5")(x, train=train)
        outs["p5"] = x
        outs["p6"] = max_pool(x, 1, 2)
        return outs


_DLA_SPECS = {
    "dla34": dict(levels=(1, 1, 1, 2, 2, 1), channels=(16, 32, 64, 128, 256, 512), block=BasicBlock),
    "dla46_c": dict(levels=(1, 1, 1, 2, 2, 1), channels=(16, 32, 64, 64, 128, 256), block=Bottleneck),
    "dla46x_c": dict(levels=(1, 1, 1, 2, 2, 1), channels=(16, 32, 64, 64, 128, 256), block=BottleneckX),
    "dla60x_c": dict(levels=(1, 1, 1, 2, 3, 1), channels=(16, 32, 64, 64, 128, 256), block=BottleneckX),
    "dla60": dict(levels=(1, 1, 1, 2, 3, 1), channels=(16, 32, 128, 256, 512, 1024), block=Bottleneck),
    "dla60x": dict(levels=(1, 1, 1, 2, 3, 1), channels=(16, 32, 128, 256, 512, 1024), block=BottleneckX),
    "dla102": dict(levels=(1, 1, 1, 3, 4, 1), channels=(16, 32, 128, 256, 512, 1024), block=Bottleneck, residual_root=True),
    "dla102x": dict(levels=(1, 1, 1, 3, 4, 1), channels=(16, 32, 128, 256, 512, 1024), block=BottleneckX, residual_root=True),
    "dla169": dict(levels=(1, 1, 2, 3, 5, 1), channels=(16, 32, 128, 256, 512, 1024), block=Bottleneck, residual_root=True),
}


def build_dla(name: str, dtype=jnp.float32) -> DLA:
    spec = dict(_DLA_SPECS[name])
    return DLA(
        levels=spec["levels"],
        channels=spec["channels"],
        block=spec["block"],
        residual_root=spec.get("residual_root", False),
        dtype=dtype,
    )
