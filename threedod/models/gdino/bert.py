"""BERT-base text encoder in flax for GroundingDINO.

GroundingDINO embeds a bert-base-uncased encoder (checkpoint keys
``bert.*``); the prompt here is the fixed phrase "ground." used by
cubercnn/data/generate_ground_segmentations.py:137-164. Tokenization is the
caller's concern (token ids in, hidden states out) — this module is the
transformer only, so it has no vocab-file dependency.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class BertLayer(nn.Module):
    dim: int = 768
    heads: int = 12
    ffn: int = 3072
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        # x: (B, L, D); mask: (B, L) bool padding mask, or (B, L, L) bool
        # pairwise mask (official per-phrase text_self_attention_masks)
        b, l, d = x.shape
        h = self.heads
        q = nn.Dense(d, dtype=self.dtype, name="q")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v")(x)

        def split(t):
            return t.reshape(b, l, h, d // h).transpose(0, 2, 1, 3)

        attn = (split(q) @ split(k).transpose(0, 1, 3, 2)) * (d // h) ** -0.5
        pair = mask[:, None, :, :] if mask.ndim == 3 else mask[:, None, None, :]
        attn = jnp.where(pair, attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ split(v)).transpose(0, 2, 1, 3).reshape(b, l, d)
        out = nn.Dense(d, dtype=self.dtype, name="attn_out")(out)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="attn_norm")(x + out)
        x = x.astype(self.dtype)

        y = nn.Dense(self.ffn, dtype=self.dtype, name="ffn_in")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=self.dtype, name="ffn_out")(y)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ffn_norm")(x + y)
        return x.astype(self.dtype)


class BertEncoder(nn.Module):
    vocab_size: int = 30522
    dim: int = 768
    layers: int = 12
    heads: int = 12
    max_len: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids, mask, token_type_ids=None, position_ids=None):
        # token_ids: (B, L); mask: (B, L) padding or (B, L, L) pairwise
        # (official GroundingDINO feeds BERT the per-phrase self-attention
        # mask and per-phrase position ids from
        # generate_masks_with_special_tokens_and_transfer_map)
        b, l = token_ids.shape
        word = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype, name="word_embeddings")(token_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(l), (b, l))
        pos = nn.Embed(self.max_len, self.dim, dtype=self.dtype, name="position_embeddings")(
            position_ids
        )
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(token_ids)
        typ = nn.Embed(2, self.dim, dtype=self.dtype, name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="embeddings_norm")(
            word + pos + typ
        ).astype(self.dtype)
        for i in range(self.layers):
            x = BertLayer(self.dim, self.heads, dtype=self.dtype, name=f"layer{i}")(x, mask)
        return x  # (B, L, 768)
