"""Shared conv/norm building blocks (flax.linen, NHWC, bf16-friendly).

Params stay float32; compute dtype is configurable per model (bfloat16 by
default on TPU so convs hit the MXU at full rate).

ConvBN folds the BatchNorm into the convolution at inference: the kernel is
scaled by gamma/sigma and the shift becomes a conv bias, so the whole block
lowers to ONE fused XLA conv (epilogue bias+ReLU) instead of a
conv -> f32-upcast -> normalize -> relu -> downcast chain. Measured on v5e
this chain was the DLA trunk's bandwidth bill: 9.2 GB accessed per bs8
512x672 step (~6x minimal activation traffic, 62% of HBM peak — the trunk
was bandwidth-bound, not MXU-bound). In train mode the batch statistics are
computed in f32 but the normalization itself runs in the compute dtype with
per-channel folded scale/shift, so no f32 activation tensor ever round-trips
HBM. The variable tree matches flax's nn.Conv/nn.BatchNorm layout exactly
(`conv/kernel`, `bn/{scale,bias}`, batch_stats `bn/{mean,var}`) so weight
converters and checkpoints are unaffected.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class _ConvKernel(nn.Module):
    """Holds the conv kernel param at `<name>/kernel` (nn.Conv layout)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class _BNParams(nn.Module):
    """Holds BN params/stats at `<name>/...` (nn.BatchNorm layout).

    Returns (scale, bias, mean, var) to use for normalization; when batch
    statistics are passed (train mode) it also updates the running stats
    with flax's rule (biased variance, ra = m*ra + (1-m)*batch).
    """

    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (self.features,), jnp.float32
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (self.features,), jnp.float32
        )
        if batch_mean is not None:
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * batch_mean
                ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * batch_var
            return scale, bias, batch_mean, batch_var
        return scale, bias, ra_mean.value, ra_var.value


class ConvBNParams(nn.Module):
    """Parameter container with ConvBN's exact variable tree (`conv/kernel`,
    `bn/{scale,bias}` + batch_stats `bn/{mean,var}`), for callers that apply
    the convolution themselves (e.g. the block-space DLA stem). Call with no
    arguments to read params + running stats; call again with batch
    statistics in train mode to apply the running-stat update."""

    features: int
    kernel: int
    cin: int
    groups: int = 1

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None):
        k = _ConvKernel(
            (self.kernel, self.kernel, self.cin // self.groups, self.features),
            name="conv",
        )()
        scale, bias, mean, var = _BNParams(self.features, name="bn")(batch_mean, batch_var)
        return k, scale, bias, mean, var


class ConvWithBiasParams(nn.Module):
    """nn.Conv's parameter tree (kernel + bias) without applying it, for
    callers that feed the weights to a fused kernel (FPN levels, RPN head)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm [+ ReLU], BN folded into the conv at eval."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Any = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False, fold_only: bool = False, cin: int | None = None):
        pad = (self.kernel - 1) // 2 * self.dilation
        cin = x.shape[-1] if x is not None else cin
        kernel = _ConvKernel(
            (self.kernel, self.kernel, cin // self.groups, self.features), name="conv"
        )()
        bn = _BNParams(self.features, name="bn")
        if fold_only:
            # param-only call: return the eval-folded (w, b) for callers that
            # apply the convolution themselves (fused trunk kernels); the
            # variable tree is identical to a normal call
            return fold_convbn(kernel, *bn(), self.eps)

        def conv(inp, w):
            return jax.lax.conv_general_dilated(
                inp,
                w,
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                rhs_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if not train:
            w, b = fold_convbn(kernel, *bn(), self.eps)  # f32 fold
            y = conv(x.astype(self.dtype), w.astype(self.dtype)) + b.astype(self.dtype)
        else:
            y = conv(x.astype(self.dtype), kernel.astype(self.dtype))
            yf = y.astype(jnp.float32)
            m = jnp.mean(yf, axis=(0, 1, 2))
            m2 = jnp.mean(jnp.square(yf), axis=(0, 1, 2))
            v = m2 - jnp.square(m)
            scale, bias, _, _ = bn(m, v)
            a = scale * jax.lax.rsqrt(v + self.eps)
            y = y * a.astype(self.dtype) + (bias - m * a).astype(self.dtype)
        if self.relu:
            y = nn.relu(y)
        return y.astype(self.dtype)


def fold_convbn(kernel, scale, bias, mean, var, eps: float = 1e-5):
    """Eval-time BN fold: returns (w, b) with conv(x, w) + b == bn(conv(x, k)).

    Same math as ConvBN's eval branch; used by the fused trunk kernels,
    which consume raw folded weights instead of applying the conv here.
    """
    s = scale * jax.lax.rsqrt(var + eps)
    return kernel * s, bias - mean * s


def max_pool(x, window: int, stride: int, padding: int = 0):
    return nn.max_pool(
        x,
        (window, window),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
    )
