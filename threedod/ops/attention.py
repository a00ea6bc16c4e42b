"""Fused multi-head attention dispatch (Pallas flash attention on TPU).

The ViT encoders (DINOv2 in the depth stack, reference
depth/metric_depth/depth_anything_v2/dinov2_layers/attention.py:29-79) use
plain full attention over ~1.4k patch tokens. XLA materialises the
(B, H, S, S) logits in HBM; the Pallas flash kernel keeps the running
softmax in VMEM — the standard TPU lever for ViT throughput (SURVEY.md
§5.7). Sequences are padded to the 128-token lane multiple and masked with
segment ids (padding tokens form their own segment, so real queries never
attend to them).

Falls back to jax.nn.dot_product_attention off-TPU or for short sequences
where the XLA path is already bandwidth-trivial.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Measured crossover on TPU v5e (bf16, H=16, D=64): XLA wins at S=1370
# (1.6 vs 3.7 ms — flash pays padding + 128-wide blocks), flash wins 2x at
# S=2048 (1.9 vs 3.8 ms) and 2.5x at S=4096 (5.5 vs 13.6 ms); at S=8192 the
# XLA path OOMs outright (16 GB f32 logits vs 15.75 GB HBM) while flash runs.
_FLASH_MIN_SEQ = 2048
_LANE = 128


def _pad_to(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.lru_cache(maxsize=None)
def _flash_available() -> bool:
    if jax.default_backend() != "tpu":
        return False
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa: F401

        return True
    except ImportError:  # pragma: no cover
        return False


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bias-free scaled dot-product attention.

    q, k, v: (B, S, H, D) — same layout as jax.nn.dot_product_attention.
    Returns (B, S, H, D) in q's dtype.
    """
    b, s, h, d = q.shape
    if not _flash_available() or s < _FLASH_MIN_SEQ:
        return jax.nn.dot_product_attention(q, k, v)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    s_pad = -(-s // _LANE) * _LANE
    # (B, S, H, D) -> (B, H, S, D), padded to the lane multiple
    qt = _pad_to(q.transpose(0, 2, 1, 3), s_pad, 2)
    kt = _pad_to(k.transpose(0, 2, 1, 3), s_pad, 2)
    vt = _pad_to(v.transpose(0, 2, 1, 3), s_pad, 2)

    if s_pad != s:
        # real tokens: segment 1; padding: segment 0 -> masked both ways
        seg = (jnp.arange(s_pad) < s).astype(jnp.int32)[None].repeat(b, axis=0)
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None

    block = min(512, s_pad)
    if s_pad % block:
        block = _LANE
    sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
    )
    out = flash_attention(
        qt, kt, vt,
        segment_ids=segment_ids,
        sm_scale=1.0 / d**0.5,
        block_sizes=sizes,
    )
    return out[:, :, :s].transpose(0, 2, 1, 3).astype(q.dtype)
