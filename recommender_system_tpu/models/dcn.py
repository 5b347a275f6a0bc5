"""DCN (Deep & Cross Network) — explicit cross features + deep tower.

TPU-native re-design of ``model/dcn.py:15-34`` and ``model/deepCross.py:17-39``
(same topology; the reference's deepCross driver additionally has a swapped-args
bug at ``model/deepCross.py:52`` that silently sets layer_num=1 — we implement the
intended topology). Cross stack runs as a ``lax.scan``
(``ops.interactions.cross_network``), deep tower in parallel, concat -> Dense(1).
"""
from __future__ import annotations

from typing import Optional, Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers.core import DNN
from ..layers.embedding import EmbeddingCollection
from ..layers.interaction import CrossNet
from ..utils.features import FeatureColumn


class DCN(nn.Module):
    feature_columns: Tuple[FeatureColumn, ...]
    cross_layers: int = 6
    hidden_units: Sequence[int] = (256, 128, 64)
    activation: str = "relu"
    dropout_rate: float = 0.0
    # deep-tower compute dtype ('bfloat16' on TPU; params/logits stay f32)
    dnn_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        emb = EmbeddingCollection(self.feature_columns, name="embeddings")(batch)
        x0 = emb.concat_flat()
        cross_out = CrossNet(self.cross_layers, name="cross")(x0)
        deep_out = DNN(self.hidden_units, activation=self.activation,
                       dtype=self.dnn_dtype,
                       dropout_rate=self.dropout_rate, name="deep")(x0, train=train)
        concat = jnp.concatenate([cross_out, deep_out], axis=-1)
        return nn.Dense(1, name="head")(concat)  # logits [B, 1]
