"""NFM (Neural Factorization Machine) — bi-interaction pooling + deep tower.

TPU-native re-design of ``model/nfm.py:15-34``: field embeddings -> bi-interaction
pool ``0.5[(sum e)^2 - sum e^2]`` (``ops.interactions.bi_interaction``) -> concat
dense -> BatchNorm -> DNN -> Dense(1).
"""
from __future__ import annotations

from typing import Optional, Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers.core import DNN
from ..layers.embedding import EmbeddingCollection
from ..ops.interactions import bi_interaction
from ..utils.features import FeatureColumn


class NFM(nn.Module):
    feature_columns: Tuple[FeatureColumn, ...]
    hidden_units: Sequence[int] = (256, 128, 64)
    activation: str = "relu"
    dropout_rate: float = 0.0
    # deep-tower compute dtype ('bfloat16' on TPU; params/logits stay f32)
    dnn_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        emb = EmbeddingCollection(self.feature_columns, name="embeddings")(batch)
        pooled = bi_interaction(emb.sparse_stack())  # [B, k]
        if emb.dense is not None:
            pooled = jnp.concatenate([pooled, emb.dense], axis=-1)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn")(pooled)
        return DNN(self.hidden_units, activation=self.activation,
                   dtype=self.dnn_dtype,
                   dropout_rate=self.dropout_rate, output_dim=1,
                   name="deep")(x, train=train)  # logits [B, 1]
