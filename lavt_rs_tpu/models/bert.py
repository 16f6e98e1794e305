"""BERT-base encoder in JAX/flax.

The reference vendors Hugging Face transformers v3.0.2's BertModel
(reference README.md:9-13; used at lib/_utils.py:37-39 with `pooler = None`).
This is a from-scratch flax implementation of the same architecture:
learned word/position/type embeddings + post-LN transformer encoder with
GELU FFN, layer_norm_eps=1e-12.  Attention masking uses the HF convention
`(1 - mask) * -10000` added to the logits.

The LAVT models consume only the last hidden state, shaped (B, N_l, 768).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import BertConfig


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, *, deterministic: bool = True):
        cfg = self.cfg
        h = cfg.num_heads
        hd = cfg.hidden_size // h
        b, n, _ = x.shape

        def split(t):
            return t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="query")(x))
        k = split(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="key")(x))
        v = split(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="value")(x))

        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / (hd**0.5) + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.attn_dropout,
                           deterministic=deterministic)(probs)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return out.transpose(0, 2, 1, 3).reshape(b, n, cfg.hidden_size)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, *, deterministic: bool = True):
        cfg = self.cfg
        attn = BertSelfAttention(cfg, dtype=self.dtype, name="attention")(
            x, attn_bias, deterministic=deterministic)
        attn = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                        name="attention_output")(attn)
        attn = nn.Dropout(cfg.hidden_dropout,
                          deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="attention_layernorm")(x + attn)

        y = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name="intermediate")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(y)
        y = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(y)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="output_layernorm")(x + y)


class BertEncoder(nn.Module):
    """BertModel minus the pooler. __call__(ids, mask) -> (B, N, hidden)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                 token_type_ids: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True):
        cfg = self.cfg
        b, n = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        position_ids = jnp.arange(n, dtype=jnp.int32)[None, :]

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                        dtype=self.dtype, name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embeddings")(
                           position_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       dtype=self.dtype, name="token_type_embeddings")(
                           token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="embeddings_layernorm")(x)
        x = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(x)

        # HF extended attention mask: (1 - m) * -10000 on the key axis.
        bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :]
        bias = bias * -10000.0

        for i in range(cfg.num_layers):
            x = BertLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(
                x, bias, deterministic=deterministic)
        return x
