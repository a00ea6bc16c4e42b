"""Deep Layer Aggregation backbones (dla34 ... dla169) in flax.

Parity target: cubercnn/modeling/backbone/dla.py — the hierarchical Tree/
Root aggregation topology and the 5-level output contract
{p2: s4, p3: s8, p4: s16, p5: s32, p6: s64 (= stride-2 maxpool of p5)}.
The recursion unrolls at module-construction time, so the compiled graph is
fully static.
"""
from __future__ import annotations

from typing import Any, Tuple, Type

import jax
import jax.numpy as jnp
from flax import linen as nn

from .block_conv import (
    block_channel_stats,
    block_conv,
    block_conv_kernel,
    depth_to_space,
    space_to_depth,
    space_to_depth_conv,
    tile_block_channels,
)
from .layers import ConvBN, ConvBNParams, fold_convbn, max_pool
from ...ops import fused_conv


class _BBFoldParams(nn.Module):
    """Eval-folded weights of a BasicBlock's two ConvBNs. Variable tree is
    identical to BasicBlock's (conv1/conv2 ConvBN layouts), so the fused and
    unfused paths share checkpoints."""

    features: int
    cin: int

    @nn.compact
    def __call__(self):
        w1, b1 = fold_convbn(*ConvBNParams(self.features, 3, self.cin, name="conv1")())
        w2, b2 = fold_convbn(*ConvBNParams(self.features, 3, self.features, name="conv2")())
        return (w1, b1, w2, b2)


class _RootFoldParams(nn.Module):
    """Eval-folded weights of a Root's 1x1 ConvBN (variable tree = Root's)."""

    features: int
    cin: int

    @nn.compact
    def __call__(self):
        w, b = fold_convbn(*ConvBNParams(self.features, 1, self.cin, name="conv")())
        return w.reshape(self.cin, self.features), b


def block_convbn(
    p: ConvBNParams, x, pad: int, stride: int, b_in: int, b_out: int,
    train: bool, dtype, eps: float = 1e-5,
):
    """ConvBN semantics applied in block space: identical math to
    ConvBN(k, stride)(native_x) with the output in (b_out, b_out, c) block
    layout. Eval folds BN into the rearranged kernel; train computes batch
    statistics per ORIGINAL channel (reducing over block positions too) and
    updates the running stats through the shared param container."""
    if not train:
        k, scale, bias, mean, var = p()
        s = scale * jax.lax.rsqrt(var + eps)
        Wb, pads = block_conv_kernel(k * s, pad, stride, b_in, b_out)
        b = tile_block_channels(bias - mean * s, b_out)
        y = block_conv(x.astype(dtype), Wb.astype(dtype), pads) + b.astype(dtype)
    else:
        k, scale, bias, _, _ = p()
        Wb, pads = block_conv_kernel(k, pad, stride, b_in, b_out)
        y = block_conv(x.astype(dtype), Wb.astype(dtype), pads)
        m, v = block_channel_stats(y, b_out, p.features)
        p(m, v)
        a = scale * jax.lax.rsqrt(v + eps)
        y = (
            y * tile_block_channels(a, b_out).astype(dtype)
            + tile_block_channels(bias - m * a, b_out).astype(dtype)
        )
    return nn.relu(y).astype(dtype)


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
        if self.level_root:
            children.append(bottom)

        # Eval fast paths (ops/fused_conv.py): fuse the stride-2 head block
        # (+maxpool+projection) and the stride-1 tail (tree2 [+ tree1] +
        # root) into Pallas kernels so x1/x2/residual stay in VMEM.
        fuse_ht = fuse_head_ht = None
        if (
            self.levels == 1
            and not train
            and self.block is BasicBlock
            and fused_conv.fused_conv_available()
        ):
            oh, ow = x.shape[1] // self.stride, x.shape[2] // self.stride
            two = self.stride == 1 and not self.project
            if all(ch.shape[1] == oh and ch.shape[2] == ow for ch in children):
                fuse_ht = fused_conv.fuse_tile(
                    "tt", oh, ow, self.features, self.features, two
                )
            if self.stride == 2 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                fuse_head_ht = fused_conv.fuse_tile(
                    "bd", oh, ow, x.shape[-1], self.features, True
                )

        wproj = bproj = residual = None
        if self.project:
            proj = ConvBN(self.features, 1, relu=False, dtype=self.dtype, name="project")
            if fuse_head_ht is not None:
                wproj, bproj = proj(None, train=False, fold_only=True, cin=x.shape[-1])
            else:
                residual = proj(bottom, train)
        else:
            residual = bottom

        if self.levels == 1:
            # The two-block tail hands `x` to tree1 as its residual, which is
            # only correct when there is no projection (stride 1 + project
            # would need proj(x) instead — fall back to the stock path).
            two_tail = fuse_ht is not None and self.stride == 1 and not self.project
            if fuse_head_ht is not None:
                bb_head = _BBFoldParams(self.features, x.shape[-1], name="tree1")()
                x1 = fused_conv.fused_block_down(
                    x, *bb_head, wproj, bproj, pool_residual=True,
                    ht=fuse_head_ht, interpret=fused_conv.kernel_interpret(),
                )
            elif not two_tail:
                x1 = self.block(self.features, self.stride, dtype=self.dtype, name="tree1")(x, residual, train=train)
            if fuse_ht is not None and self.stride > 1:
                bb_b = _BBFoldParams(self.features, self.features, name="tree2")()
                ctot = 2 * self.features + sum(ch.shape[-1] for ch in children)
                wr, br = _RootFoldParams(self.features, ctot, name="root")()
                out = fused_conv.fused_tree_tail(
                    x1, tuple(children), None, bb_b, wr, br,
                    two_blocks=False, include_input_child=False,
                    root_residual=self.root_residual, ht=fuse_ht,
                    interpret=fused_conv.kernel_interpret(),
                )
            elif two_tail:
                # stride 1, no projection: tree1's residual is x itself, and
                # the last child (appended by the outer tree) IS x — read it
                # from the already-resident input tile instead of re-fetching
                bb_a = _BBFoldParams(self.features, x.shape[-1], name="tree1")()
                bb_b = _BBFoldParams(self.features, self.features, name="tree2")()
                incl = bool(children) and children[-1] is x
                ch_list = children[:-1] if incl else children
                ctot = (
                    2 * self.features
                    + sum(c2.shape[-1] for c2 in ch_list)
                    + (self.features if incl else 0)
                )
                wr, br = _RootFoldParams(self.features, ctot, name="root")()
                out = fused_conv.fused_tree_tail(
                    x, tuple(ch_list), bb_a, bb_b, wr, br,
                    two_blocks=True, include_input_child=incl,
                    root_residual=self.root_residual, ht=fuse_ht,
                    interpret=fused_conv.kernel_interpret(),
                )
            else:
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


class _FastBlockDown(nn.Module):
    """BasicBlock with stride 2 whose first conv consumes b=2 block layout
    (variable tree identical to BasicBlock: conv1/conv2)."""

    features: int
    cin: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, yb, residual, train: bool = False):
        p1 = ConvBNParams(self.features, 3, self.cin, name="conv1")
        out = block_convbn(p1, yb, 1, 2, 2, 1, train, self.dtype)
        out = ConvBN(self.features, 3, 1, relu=False, dtype=self.dtype, name="conv2")(out, train)
        return nn.relu(out + residual)


class _FastLevel2(nn.Module):
    """Tree(levels=1, BasicBlock, stride=2) consuming the stem's b=2 block
    layout directly — the max-pool bottom is a within-block reduction and
    the stride-2 conv1 is a block conv, so the full-resolution tensor never
    materialises in native layout (saves a 1.6 ms depth-to-space on v5e).
    Variable tree matches Tree exactly (project/tree1/tree2/root)."""

    features: int
    project: bool
    root_residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, yb, train: bool = False):
        B, Yh, Yw, ch = yb.shape
        c1 = ch // 4
        bottom = yb.reshape(B, Yh, Yw, 2, 2, c1).max(axis=(3, 4))
        if self.project:
            residual = ConvBN(self.features, 1, relu=False, dtype=self.dtype, name="project")(bottom, train)
        else:
            residual = bottom
        x1 = _FastBlockDown(self.features, c1, dtype=self.dtype, name="tree1")(yb, residual, train=train)
        fuse_ht = None
        if not train and fused_conv.fused_conv_available():
            fuse_ht = fused_conv.fuse_tile(
                "tt", x1.shape[1], x1.shape[2], self.features, self.features, False
            )
        if fuse_ht is not None:
            bb_b = _BBFoldParams(self.features, self.features, name="tree2")()
            wr, br = _RootFoldParams(self.features, 2 * self.features, name="root")()
            return fused_conv.fused_tree_tail(
                x1, (), None, bb_b, wr, br,
                two_blocks=False, include_input_child=False,
                root_residual=self.root_residual, ht=fuse_ht,
                interpret=fused_conv.kernel_interpret(),
            )
        x2 = BasicBlock(self.features, 1, dtype=self.dtype, name="tree2")(x1, train=train)
        return Root(self.features, self.root_residual, dtype=self.dtype, name="root")([x2, x1], train)


class DLA(nn.Module):
    """DLA trunk; returns {'p2': s4 ... 'p6': s64} feature dict.

    fast_stem: when the input is 4-divisible, the small-channel
    full-resolution stem (base_layer + level0 + level1, reference
    cubercnn/modeling/backbone/dla.py:97-133) runs in b=4 space-to-depth
    block layout — numerically identical (same multiply-adds, rearranged
    kernels), ~3x faster on TPU (see block_conv.py). For DLA34-shaped
    level2 (levels[2]==1, BasicBlock) the block layout feeds level2
    directly; otherwise a depth-to-space restores the native layout.
    """

    levels: Tuple[int, ...]
    channels: Tuple[int, ...]
    block: Type[nn.Module] = BasicBlock
    residual_root: bool = False
    dtype: Any = jnp.float32
    fast_stem: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        fast = self.fast_stem and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
        fast_l2 = fast and self.levels[2] == 1 and self.block is BasicBlock
        outs = {}
        if fast:
            # mode-split s2d (values bit-equal either way, pinned by
            # tests/test_layout_equiv.py): the conv form wins the TRAIN
            # step (78.3 -> 76.0 ms, its one-hot transposed-conv backward
            # beats the reshape chain's) but LOSES at eval (26.0 -> 26.7
            # ms — XLA feeds the conv via a ~1 ms batch-minor image
            # relayout the reshape form avoids). DESIGN 17b/17c.
            s2d = space_to_depth_conv if train else space_to_depth
            y = s2d(x.astype(self.dtype), 4)
            y = block_convbn(
                ConvBNParams(ch[0], 7, 3, name="base_layer"), y, 3, 1, 4, 4, train, self.dtype
            )
            for i in range(self.levels[0]):
                y = block_convbn(
                    ConvBNParams(ch[0], 3, ch[0], name=f"level0_{i}"), y, 1, 1, 4, 4, train, self.dtype
                )
            for i in range(self.levels[1]):
                if i == 0:
                    y = block_convbn(
                        ConvBNParams(ch[1], 3, ch[0], name="level1_0"), y, 1, 2, 4, 2, train, self.dtype
                    )
                else:
                    y = block_convbn(
                        ConvBNParams(ch[1], 3, ch[1], name=f"level1_{i}"), y, 1, 1, 2, 2, train, self.dtype
                    )
            if fast_l2:
                x = _FastLevel2(
                    ch[2], project=ch[1] != ch[2],
                    root_residual=self.residual_root, dtype=self.dtype, name="level2",
                )(y, train=train)
            else:
                x = depth_to_space(y, 2)
        else:
            x = ConvBN(ch[0], 7, 1, dtype=self.dtype, name="base_layer")(x, train)
            # level0 / level1: plain conv stages
            for i in range(self.levels[0]):
                x = ConvBN(ch[0], 3, 1, dtype=self.dtype, name=f"level0_{i}")(x, train)
            for i in range(self.levels[1]):
                x = ConvBN(ch[1], 3, 2 if i == 0 else 1, dtype=self.dtype, name=f"level1_{i}")(x, train)

        if not fast_l2:
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
