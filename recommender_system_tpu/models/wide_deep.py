"""Wide&Deep — linear (wide) memorization + DNN (deep) generalization.

TPU-native re-design of ``model/wideDeep.py:14-34``. The reference's wide side
takes ``[dense | one-hot]`` through ``WideLayer`` and averages with the deep logit
(``sigmoid(0.5*(wide+deep))``). Here the wide side is the gather-based
``LinearEmbedding`` (mathematically the same w.X over the one-hot encoding), and
the two logits are summed (equivalent up to a constant scale).
"""
from __future__ import annotations

from typing import Optional, Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers.core import DNN
from ..layers.embedding import UnifiedEmbedding
from ..utils.features import FeatureColumn


class WideDeep(nn.Module):
    feature_columns: Tuple[FeatureColumn, ...]
    hidden_units: Sequence[int] = (256, 128, 64)
    activation: str = "relu"
    dropout_rate: float = 0.0
    # deep-tower compute dtype ('bfloat16' on TPU; params/logits stay f32)
    dnn_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        # wide (linear) weights live in an extra lane of the deep embeddings
        emb, wide = UnifiedEmbedding(self.feature_columns, name="unified")(batch)
        deep = DNN(self.hidden_units, activation=self.activation,
                   dtype=self.dnn_dtype,
                   dropout_rate=self.dropout_rate, output_dim=1,
                   name="deep")(emb.concat_flat(), train=train)
        return 0.5 * (wide + deep)  # logits [B, 1]
