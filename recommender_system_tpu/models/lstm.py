"""LSTM sequence classifier.

TPU-native counterpart of ``model/lstm.py:15-83`` (an RNN wrapper over the
vendored-and-broken keras ``LSTMCell``, ``layer/nlp.py:269-449``): embedding ->
``lax.scan`` LSTM (``ops.rnn.lstm``, implementing the *intended* gate math) ->
last valid state -> dense head.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.rnn import LSTMParams, lstm


class LSTMClassifier(nn.Module):
    vocab_size: int
    embed_dim: int = 64
    hidden: int = 64
    num_classes: int = 1

    @nn.compact
    def __call__(self, token_ids, train: bool = False):  # [B, T] int32
        table = self.param("embedding", nn.initializers.normal(0.02),
                           (self.vocab_size, self.embed_dim))
        x = jnp.take(table, token_ids, axis=0)
        mask = token_ids != 0
        wx = self.param("wx", nn.initializers.glorot_uniform(),
                        (self.embed_dim, 4 * self.hidden))
        wh = self.param("wh", nn.initializers.orthogonal(),
                        (self.hidden, 4 * self.hidden))
        bias = self.param("bias",
                          lambda k, s: jnp.zeros(s).at[self.hidden:2 * self.hidden].set(1.0),
                          (4 * self.hidden,))
        _, (h_last, _) = lstm(LSTMParams(wx, wh, bias), x, mask=mask)
        return nn.Dense(self.num_classes, name="head")(h_last)  # logits
