"""Exact order statistics without sorting (TPU-native).

jnp.sort/argsort are the wrong tool on TPU for rank queries: an (R,)
argsort at RPN anchor counts (~85k) costs a full bitonic SortOp
(~0.3-0.6 ms each on v5e), while a rank threshold needs only 32 fixed
compare+reduce passes over the same data (radix bisection on the
order-preserving uint32 key space). Used by the weak-loss quantiles
(models/weak_heads.py) and the RPN anchor subsampler (ops/matcher.py).

Reference semantics being replaced: torch.sort / torch.multinomial rank
machinery in the reference RPN (rpn.py:275-328) and the depth quantiles
(roi_heads.py:1196-1305).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

F32_SIGN = jnp.uint32(0x80000000)


def order_keys(v):
    """Order-preserving map f32 -> uint32 (the radix-sort key transform):
    non-negative floats keep their bit pattern with the sign bit set;
    negative floats are bitwise-complemented."""
    u = jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.uint32)
    return jnp.where((u & F32_SIGN) != 0, ~u, u | F32_SIGN)


def keys_to_f32(u):
    """Inverse of order_keys."""
    w = jnp.where((u & F32_SIGN) != 0, u ^ F32_SIGN, ~u)
    return jax.lax.bitcast_convert_type(w, jnp.float32)


def kth_smallest(keys, idx):
    """Exact idx-th (0-based) order statistic per row by bisection on the
    uint32 key space: 32 fixed (..., K)-compare passes instead of a sort.

    The bisection converges to the smallest key whose rank reaches idx+1,
    which IS the idx-th order statistic — bit-identical to the sort-based
    definition. keys (..., K) uint32 from order_keys; idx (...,) int.
    Returns (...,) f32.
    """
    lo = jnp.zeros(keys.shape[:-1], jnp.uint32)
    hi = jnp.full(keys.shape[:-1], jnp.uint32(0xFFFFFFFF))
    target = (idx + 1).astype(jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum((keys <= mid[..., None]).astype(jnp.int32), axis=-1)
        take = cnt >= target  # answer <= mid
        return jnp.where(take, lo, mid + 1), jnp.where(take, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return keys_to_f32(hi)


def top_take_mask(values, mask, take):
    """Boolean mask of the `take` largest masked values — no sort.

    Equivalent to `mask & (rank_desc(values within mask) < take)` for any
    dynamic take >= 0 (clipped to the masked count): computes the take-th
    largest masked value by radix bisection and thresholds on it. Ties at
    the threshold are all selected (measure-zero for continuous keys such
    as Gumbel perturbations; the sort-based rank breaks such ties by
    position instead).

    values (..., K) f32, mask (..., K) bool, take (...,) int.
    """
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    keys = order_keys(jnp.where(mask, values, big))
    n = jnp.sum(mask, axis=-1)
    take = jnp.minimum(take, n)
    # take-th largest == (n - take)-th smallest (0-based), of masked entries
    idx = jnp.clip(n - take, 0, values.shape[-1] - 1)
    t = kth_smallest(keys, idx)
    return mask & (values >= t[..., None]) & (take > 0)[..., None]
