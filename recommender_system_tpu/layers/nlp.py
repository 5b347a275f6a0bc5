"""Transformer building blocks: scaled embedding, sinusoidal PE, MHA, FFN.

Flax counterpart of ``/root/reference/algorithm/deep_learning/layer/nlp.py``:
- ``ScaledEmbedding``   <- ``Embedding`` (``nlp.py:21-44``, gather x sqrt(d))
- ``sinusoidal_pe``     <- ``PositionEncoding`` (``nlp.py:181-197``) but precomputed
  once as a constant instead of per-call numpy.
- ``MultiHeadAttention``<- ``nlp.py:119-178`` with proper [B, H, T, dh] head split
  (the reference splits heads by concatenating on the batch axis).
- ``PositionWiseFFN``   <- ``nlp.py:200-237``.
- LayerNorm uses ``nn.LayerNorm`` (manual version at ``nlp.py:240-261``).
Causal masking matches the decoder's lower-triangular mask (``nlp.py:91-97``).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.seqpool import NEG_INF


class ScaledEmbedding(nn.Module):
    vocab_size: int
    dim: int

    @nn.compact
    def __call__(self, ids):
        table = self.param("table", nn.initializers.normal(0.02),
                           (self.vocab_size, self.dim))
        return jnp.take(table, ids, axis=0) * jnp.sqrt(float(self.dim))

    def attend(self, x):
        """Tied output projection (reference ties output to embeddings,
        ``model/transformer.py:149``)."""
        table = self.get_variable("params", "table")
        return jnp.dot(x, table.T, preferred_element_type=jnp.float32)


def sinusoidal_pe(max_len: int, dim: int) -> jnp.ndarray:
    """Precomputed sinusoidal position encoding ``[max_len, dim]``."""
    pos = np.arange(max_len)[:, None].astype(np.float64)
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / dim)
    pe = np.zeros((max_len, dim))
    pe[:, 0::2] = np.sin(angle[:, 0::2])
    pe[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(pe, jnp.float32)


def causal_mask(T: int) -> jnp.ndarray:
    return jnp.tril(jnp.ones((T, T), bool))


class MultiHeadAttention(nn.Module):
    """Scaled dot-product multi-head attention with padding + causal masks."""

    num_heads: int
    model_dim: int
    dropout_rate: float = 0.0
    causal: bool = False

    @nn.compact
    def __call__(self, q_in, kv_in, key_padding_mask: Optional[jax.Array] = None,
                 train: bool = False):
        B, Tq, _ = q_in.shape
        Tk = kv_in.shape[1]
        H, dh = self.num_heads, self.model_dim // self.num_heads

        def proj(x, name):
            return nn.Dense(self.model_dim, name=name)(x).reshape(
                x.shape[0], x.shape[1], H, dh).transpose(0, 2, 1, 3)

        q = proj(q_in, "q")  # [B, H, Tq, dh]
        k = proj(kv_in, "k")
        v = proj(kv_in, "v")

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(float(dh))
        mask = jnp.ones((B, 1, Tq, Tk), bool)
        if key_padding_mask is not None:  # [B, Tk] True = valid
            mask = mask & key_padding_mask[:, None, None, :]
        if self.causal:
            mask = mask & causal_mask(Tq)[None, None, :, :Tk]
        logits = jnp.where(mask, logits, NEG_INF)
        att = jax.nn.softmax(logits, axis=-1)
        att = nn.Dropout(self.dropout_rate, deterministic=not train)(att)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.model_dim)
        return nn.Dense(self.model_dim, name="out")(out)


class PositionWiseFFN(nn.Module):
    hidden_dim: int
    model_dim: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(nn.Dense(self.hidden_dim, name="in")(x))
        return nn.Dense(self.model_dim, name="out")(h)


class EncoderBlock(nn.Module):
    num_heads: int
    model_dim: int
    ffn_dim: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, padding_mask=None, train: bool = False):
        att = MultiHeadAttention(self.num_heads, self.model_dim,
                                 self.dropout_rate, name="mha")(
            x, x, key_padding_mask=padding_mask, train=train)
        att = nn.Dropout(self.dropout_rate, deterministic=not train)(att)
        x = nn.LayerNorm(name="ln1")(x + att)
        ffn = PositionWiseFFN(self.ffn_dim, self.model_dim, name="ffn")(x)
        ffn = nn.Dropout(self.dropout_rate, deterministic=not train)(ffn)
        return nn.LayerNorm(name="ln2")(x + ffn)


class DecoderBlock(nn.Module):
    num_heads: int
    model_dim: int
    ffn_dim: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, enc_out, self_padding_mask=None, enc_padding_mask=None,
                 train: bool = False):
        self_att = MultiHeadAttention(self.num_heads, self.model_dim,
                                      self.dropout_rate, causal=True,
                                      name="self_mha")(
            x, x, key_padding_mask=self_padding_mask, train=train)
        self_att = nn.Dropout(self.dropout_rate, deterministic=not train)(self_att)
        x = nn.LayerNorm(name="ln1")(x + self_att)
        cross = MultiHeadAttention(self.num_heads, self.model_dim,
                                   self.dropout_rate, name="cross_mha")(
            x, enc_out, key_padding_mask=enc_padding_mask, train=train)
        cross = nn.Dropout(self.dropout_rate, deterministic=not train)(cross)
        x = nn.LayerNorm(name="ln2")(x + cross)
        ffn = PositionWiseFFN(self.ffn_dim, self.model_dim, name="ffn")(x)
        ffn = nn.Dropout(self.dropout_rate, deterministic=not train)(ffn)
        return nn.LayerNorm(name="ln3")(x + ffn)
