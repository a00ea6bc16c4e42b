"""Space-to-depth ("block space") convolution transforms for small-channel
full-resolution conv stages.

Motivation (measured, v5e, bs8 512x672 bf16): the DLA stem — 7x7 s1 conv on
3 channels + two 3x3 convs on 16/32 channels at full resolution (reference
topology: cubercnn/modeling/backbone/dla.py:97-133 base_layer/level0/level1)
— ran at 3.1 TF/s and 10.4 ms because XLA pads the channel (lane) dimension
to 128, inflating HBM traffic ~6x and starving the MXU's 128-wide
contraction. Re-laying the image out as b x b blocks folded into channels
(space-to-depth) turns the same math into convs with 48..256-channel
operands that tile the MXU properly: the identical stem computes in ~3.3 ms.

The transform is exact, not approximate: a k x k, stride-s conv on the
original layout equals a kb x kb, stride-1 conv on the (H/b_in, W/b_in,
b_in*b_in*C) layout producing (b_out*b_out*Cout) channels per block, where
b_in = s * b_out and the block kernel is a sparse scatter of the original
kernel's taps (most entries zero — the MXU multiplies them for free).
Channel order convention everywhere: (dy, dx, c) — row-major block offset,
then original channel.

Derivation: for output block position o in [0, b_out) and tap kk in [0, k),
the input coordinate relative to the block origin is u = s*o + kk - pad.
Decompose u = b_in*delta + du; then delta spans [floor(-pad/b_in),
floor((s*(b_out-1)+k-1-pad)/b_in)], giving the block-kernel extent and an
asymmetric block padding (-delta_min, delta_max).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C), channel order (dy, dx, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // b, b, W // b, b, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // b, W // b, b * b * C)


def space_to_depth_conv(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """space_to_depth computed as a stride-b one-hot conv (same values).

    The reshape-transpose form leaves XLA a 6-D transpose with a 3-lane
    minor dimension, which it lowers as two large layout copies (~0.8
    ms/step on the bs8 512x672 stem); expressing the identical permutation
    as a conv with a one-hot (b, b, C, b*b*C) kernel rides the conv
    emitter's im2col path instead. Exact for finite inputs: each output
    element is v*1 + 0*others accumulated in f32 (precision=HIGHEST keeps
    the f32 path from splitting v's mantissa).
    """
    B, H, W, C = x.shape
    k = np.zeros((b, b, C, b * b * C), x.dtype)
    for dy in range(b):
        for dx in range(b):
            for c in range(C):
                k[dy, dx, c, (dy * b + dx) * C + c] = 1
    return jax.lax.conv_general_dilated(
        x,
        jnp.asarray(k),
        window_strides=(b, b),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def depth_to_space(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """Inverse of space_to_depth."""
    B, H, W, C = x.shape
    c = C // (b * b)
    x = x.reshape(B, H, W, b, b, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * b, W * b, c)


def block_conv_geometry(k: int, pad: int, stride: int, b_in: int, b_out: int):
    """Block-kernel extent and padding for the equivalent block conv."""
    assert b_in == stride * b_out, (b_in, stride, b_out)
    u_min = -pad
    u_max = stride * (b_out - 1) + k - 1 - pad
    d_min = u_min // b_in
    d_max = u_max // b_in
    kb = d_max - d_min + 1
    return kb, (-d_min, d_max)


def block_conv_kernel(
    K: jnp.ndarray, pad: int, stride: int, b_in: int, b_out: int
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Rearrange an HWIO kernel (k, k, ci, co) into the equivalent block-space
    kernel (kb, kb, b_in²·ci, b_out²·co) + its asymmetric padding.

    Differentiable (pure gather * static mask), so the train step's weight
    gradients flow back to the original kernel layout unchanged.
    """
    k, k2, ci, co = K.shape
    assert k == k2, "square kernels only"
    kb, pads = block_conv_geometry(k, pad, stride, b_in, b_out)
    d_min = -pads[0]

    kap = np.arange(kb)[:, None, None]
    du = np.arange(b_in)[None, :, None]
    o = np.arange(b_out)[None, None, :]
    kk = b_in * (kap + d_min) + du - stride * o + pad  # (kb, b_in, b_out)
    valid = (kk >= 0) & (kk < k)
    kkc = np.clip(kk, 0, k - 1)

    # W8[ky_b, dy, oy, kx_b, dx, ox, ci, co]
    W8 = K[kkc[:, :, :, None, None, None], kkc[None, None, None, :, :, :], :, :]
    mask = (valid[:, :, :, None, None, None] & valid[None, None, None, :, :, :])
    W8 = W8 * jnp.asarray(mask[..., None, None], K.dtype)
    # -> (ky_b, kx_b, dy, dx, ci, oy, ox, co)
    W8 = W8.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    Wb = W8.reshape(kb, kb, b_in * b_in * ci, b_out * b_out * co)
    return Wb, pads


def block_conv(
    x: jnp.ndarray, Wb: jnp.ndarray, pads: Tuple[int, int]
) -> jnp.ndarray:
    """Apply a block-space kernel produced by block_conv_kernel."""
    return jax.lax.conv_general_dilated(
        x,
        Wb,
        window_strides=(1, 1),
        padding=[pads, pads],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def block_maxpool_3x3_s2(yb: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 max pool applied to a b=2 block-layout tensor
    (B, Y, X, 2*2*C), emitting the native (B, Y, X, C) stride-doubled map
    (the torchvision ResNet/DenseNet stem pool).

    Output pixel (i, j) maxes native rows {2i-1, 2i, 2i+1}: within-block
    offsets (oy=0, oy=1) of block i plus oy=1 of block i-1 (likewise for
    columns), so the overlapping window never materialises the
    full-resolution tensor in native layout. Out-of-image taps are -inf,
    matching flax.nn.max_pool's padding identity."""
    b_sz, yh, xw, c4 = yb.shape
    c = c4 // 4
    u = yb.reshape(b_sz, yh, xw, 2, 2, c)
    neg = jnp.asarray(-jnp.inf, yb.dtype)
    up = jnp.pad(
        u[:, :-1, :, 1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)),
        constant_values=neg,
    )  # block i-1, oy=1
    rows = jnp.maximum(jnp.maximum(u[:, :, :, 0], u[:, :, :, 1]), up)  # (B,Y,X,ox,C)
    left = jnp.pad(
        rows[:, :, :-1, 1], ((0, 0), (0, 0), (1, 0), (0, 0)),
        constant_values=neg,
    )  # block j-1, ox=1
    return jnp.maximum(jnp.maximum(rows[:, :, :, 0], rows[:, :, :, 1]), left)


def tile_block_channels(v: jnp.ndarray, b_out: int) -> jnp.ndarray:
    """Tile a per-original-channel vector (co,) across block positions to
    (b_out²·co,), matching the (oy, ox, co) channel order."""
    return jnp.tile(v, (b_out * b_out,))


def block_channel_stats(y: jnp.ndarray, b_out: int, co: int):
    """Batch-norm statistics per ORIGINAL channel from a block-layout tensor
    (B, Y, X, b_out²·co): mean/var reduce over batch, space, and block
    position — exactly the stats the native-layout conv would produce."""
    yf = y.astype(jnp.float32).reshape(y.shape[:-1] + (b_out * b_out, co))
    m = jnp.mean(yf, axis=(0, 1, 2, 3))
    m2 = jnp.mean(jnp.square(yf), axis=(0, 1, 2, 3))
    return m, m2 - jnp.square(m)
