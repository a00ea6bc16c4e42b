#!/usr/bin/env python
"""SAM ViT-B encoder TPU attribution: the full 1024px encoder measured
85 ms (tools/profile_asset.py, round 4) against a ~25-30 ms paper
estimate. This times one windowed block, one global block, each with and
without the decomposed rel-pos bias, and the attention internals, to name
the pathological stage before attacking it.

Usage: python tools/profile_sam_enc.py [--only win,glob]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(run, k_a=3, k_b=11):
    run(2)
    t_a = run(k_a)
    t_b = run(k_b)
    return (t_b - t_a) / (k_b - k_a)


def loop_runner(jfn, *args):
    def run(k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for _ in range(k):
            s = s + jfn(*args)
        jax.device_get(s)
        return time.perf_counter() - t0
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    want = set(args.only.split(",")) if args.only else None

    from threedod.models.sam import SamAttention, SamBlock

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    g = 64  # 1024/16 grid
    dim, heads = 768, 12
    x = jnp.asarray(rng.randn(1, g, g, dim).astype(np.float32), dt)

    rows = {}

    def go(name, make):
        if want is not None and name not in want:
            return
        t = timed(make())
        rows[name] = t * 1e3
        print(f"{name:22s} {t * 1e3:9.2f} ms", flush=True)

    def block_runner(window, global_attn, use_rel_pos=True):
        class B(SamBlock):
            pass
        m = SamBlock(dim, heads, window=window, global_attn=global_attn,
                     input_size=(g, g), dtype=dt)
        if not use_rel_pos:
            # patch the attention module's flag through a wrapper module
            import flax.linen as nn

            class NoRel(nn.Module):
                @nn.compact
                def __call__(self, t):
                    shortcut = t
                    h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(t)
                    h = SamAttention(dim, heads, use_rel_pos=False,
                                     input_size=(g, g), dtype=dt, name="attn")(h)
                    t = shortcut + h
                    h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(t)
                    h = nn.Dense(dim * 4, dtype=dt, name="mlp_lin1")(h)
                    h = nn.gelu(h, approximate=False)
                    h = nn.Dense(dim, dtype=dt, name="mlp_lin2")(h)
                    return t + h
            m = NoRel()
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda p, t: m.apply(p, t).astype(jnp.float32).sum())
        return loop_runner(f, params, x)

    go("block_win14", lambda: block_runner(14, False))
    go("block_glob", lambda: block_runner(14, True))
    go("block_glob_norel", lambda: block_runner(14, True, use_rel_pos=False))

    # attention-only variants at global geometry
    def attn_runner(use_rel_pos):
        m = SamAttention(dim, heads, use_rel_pos=use_rel_pos,
                         input_size=(g, g), dtype=dt)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda p, t: m.apply(p, t).astype(jnp.float32).sum())
        return loop_runner(f, params, x)

    go("attn_glob_rel", lambda: attn_runner(True))
    go("attn_glob_norel", lambda: attn_runner(False))

    # flash-path reference at the same geometry (bias-free)
    def flash_runner():
        from threedod.ops.attention import multi_head_attention

        q = jnp.asarray(rng.randn(1, g * g, heads, dim // heads).astype(np.float32), dt)
        f = jax.jit(lambda q_: multi_head_attention(q_, q_, q_).astype(jnp.float32).sum())
        return loop_runner(f, q)

    go("flash_glob_ref", flash_runner)

    print("\nsummary (ms):")
    for k, v in rows.items():
        print(f"  {k:22s} {v:9.2f}")
    if "block_win14" in rows and "block_glob" in rows:
        print(f"  {'encoder est (8w+4g)':22s} {8 * rows['block_win14'] + 4 * rows['block_glob']:9.2f}")


if __name__ == "__main__":
    main()
