"""DeepFM — joint FM + deep tower over shared embeddings.

TPU-native re-design of ``model/deepFM.py:15-31``. The reference feeds
``concat(dense, flattened embeddings)`` into *both* ``FMLayer`` (with its own
separate factor matrix) and ``DNNLayer``, averaging the two logits. The intended
DeepFM (Guo et al. 2017) — implemented here — shares ONE set of field embeddings
between the FM second-order term and the deep tower, plus a first-order linear
part: that's the "shared-embedding joint wide/deep training" capability the
north-star names. Output logit = linear + fm + deep.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers.core import DNN
from ..layers.embedding import UnifiedEmbedding
from ..ops.interactions import bi_interaction
from ..utils.features import FeatureColumn


class DeepFM(nn.Module):
    feature_columns: Tuple[FeatureColumn, ...]
    hidden_units: Sequence[int] = (256, 128, 64)
    activation: str = "relu"
    dropout_rate: float = 0.0
    # compute dtype for the deep tower ('bfloat16' halves its HBM activation
    # traffic on TPU; logits/loss stay f32)
    dnn_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        # fused first-order + factor lookup: one gather/scatter for both
        emb, linear = UnifiedEmbedding(self.feature_columns, name="unified")(batch)
        stacked = emb.sparse_stack()  # [B, F, k] (fused path when possible)
        if emb.pooled:
            pooled = [v[:, None, :] for v in emb.pooled.values()]
            stacked = jnp.concatenate([stacked] + pooled, axis=1)
        fm_logit = jnp.sum(bi_interaction(stacked), axis=-1, keepdims=True)

        B = stacked.shape[0]
        deep_in = stacked.reshape(B, -1)
        if emb.dense is not None:
            deep_in = jnp.concatenate([deep_in, emb.dense], axis=-1)
        deep_logit = DNN(self.hidden_units, activation=self.activation,
                         dropout_rate=self.dropout_rate, output_dim=1,
                         dtype=self.dnn_dtype, name="deep")(deep_in, train=train)
        return linear + fm_logit + deep_logit  # logits [B, 1]
