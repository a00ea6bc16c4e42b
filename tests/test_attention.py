"""Fused attention dispatch (threedod/ops/attention.py).

On the CPU test platform the wrapper must exactly match
jax.nn.dot_product_attention (it falls back off-TPU); the padding helper is
checked separately. The flash path itself is numerics-checked on the real
TPU (see docs/DESIGN.md perf notes) — it cannot compile on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np

from threedod.ops.attention import _pad_to, multi_head_attention


class TestMultiHeadAttention:
    def test_matches_reference_on_cpu(self):
        rng = np.random.RandomState(0)
        q, k, v = (jnp.asarray(rng.randn(2, 130, 4, 16).astype(np.float32)) for _ in range(3))
        got = multi_head_attention(q, k, v)
        want = jax.nn.dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_grads_flow(self):
        rng = np.random.RandomState(1)
        q, k, v = (jnp.asarray(rng.randn(1, 64, 2, 8).astype(np.float32)) for _ in range(3))
        g = jax.grad(lambda q: multi_head_attention(q, k, v).sum())(q)
        assert np.isfinite(np.asarray(g)).all()

    def test_pad_to(self):
        x = jnp.ones((2, 130, 4, 16))
        y = _pad_to(x, 256, 1)
        assert y.shape == (2, 256, 4, 16)
        assert float(y[:, 130:].sum()) == 0.0
        assert _pad_to(x, 130, 1) is x
