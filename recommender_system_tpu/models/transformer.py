"""Transformer — full encoder-decoder with tied embeddings, plus a classifier.

TPU-native re-design of ``model/transformer.py:13-157``: shared token embeddings
scaled by sqrt(d), precomputed sinusoidal position encoding, N x (MHA + AddNorm +
FFN) encoder, decoder with causal self-attention + cross-attention, output
projection tied to the embedding table (``model/transformer.py:149``).
``TransformerClassifier`` covers the reference driver's IMDB sentiment use
(``model/transformer.py:169-213``) with an encoder + mean-pool + head.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers.nlp import (DecoderBlock, EncoderBlock, ScaledEmbedding,
                          sinusoidal_pe)


class Transformer(nn.Module):
    vocab_size: int
    model_dim: int = 128
    num_heads: int = 8
    num_layers: int = 6
    ffn_dim: int = 512
    max_len: int = 128
    dropout_rate: float = 0.1

    def setup(self):
        self.embedding = ScaledEmbedding(self.vocab_size, self.model_dim)
        self.pe = sinusoidal_pe(self.max_len, self.model_dim)
        self.encoder_blocks = [
            EncoderBlock(self.num_heads, self.model_dim, self.ffn_dim,
                         self.dropout_rate, name=f"enc_{i}")
            for i in range(self.num_layers)]
        self.decoder_blocks = [
            DecoderBlock(self.num_heads, self.model_dim, self.ffn_dim,
                         self.dropout_rate, name=f"dec_{i}")
            for i in range(self.num_layers)]

    def encode(self, src_ids, train: bool = False):
        mask = src_ids != 0
        x = self.embedding(src_ids) + self.pe[None, : src_ids.shape[1]]
        for blk in self.encoder_blocks:
            x = blk(x, padding_mask=mask, train=train)
        return x, mask

    def decode(self, tgt_ids, enc_out, enc_mask, train: bool = False):
        mask = tgt_ids != 0
        x = self.embedding(tgt_ids) + self.pe[None, : tgt_ids.shape[1]]
        for blk in self.decoder_blocks:
            x = blk(x, enc_out, self_padding_mask=mask, enc_padding_mask=enc_mask,
                    train=train)
        return self.embedding.attend(x)  # tied projection -> [B, T, vocab]

    def __call__(self, src_ids, tgt_ids, train: bool = False):
        enc_out, enc_mask = self.encode(src_ids, train=train)
        return self.decode(tgt_ids, enc_out, enc_mask, train=train)


class TransformerClassifier(nn.Module):
    """Encoder + masked mean pool + dense head (sentiment-classification
    capability of the reference driver)."""

    vocab_size: int
    model_dim: int = 128
    num_heads: int = 8
    num_layers: int = 2
    ffn_dim: int = 256
    max_len: int = 128
    num_classes: int = 1
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, token_ids, train: bool = False):
        mask = token_ids != 0
        pe = sinusoidal_pe(self.max_len, self.model_dim)
        x = ScaledEmbedding(self.vocab_size, self.model_dim,
                            name="embedding")(token_ids)
        x = x + pe[None, : token_ids.shape[1]]
        for i in range(self.num_layers):
            x = EncoderBlock(self.num_heads, self.model_dim, self.ffn_dim,
                             self.dropout_rate, name=f"enc_{i}")(
                x, padding_mask=mask, train=train)
        m = mask.astype(x.dtype)[..., None]
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        return nn.Dense(self.num_classes, name="head")(pooled)  # logits
