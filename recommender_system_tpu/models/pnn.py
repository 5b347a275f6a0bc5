"""PNN (Product-based Neural Network) — inner/outer product interactions + DNN.

TPU-native re-design of ``model/pnn.py:14-53``: field embeddings, optional FGCNN
extra feature maps, inner products via batched gram matmul and/or kernel-weighted
outer products (``ops.interactions``), concat with flat embeddings and dense,
then the deep tower. ``mode``: 'inner' | 'outer' | 'both'.
"""
from __future__ import annotations

from typing import Optional, Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers.core import DNN
from ..layers.embedding import EmbeddingCollection
from ..layers.interaction import FGCNN, OuterProductLayer
from ..ops.interactions import pairwise_inner
from ..utils.features import FeatureColumn


class PNN(nn.Module):
    feature_columns: Tuple[FeatureColumn, ...]
    mode: str = "inner"
    use_fgcnn: bool = False
    hidden_units: Sequence[int] = (256, 128, 64)
    activation: str = "relu"
    dropout_rate: float = 0.0
    # deep-tower compute dtype ('bfloat16' on TPU; params/logits stay f32)
    dnn_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        emb = EmbeddingCollection(self.feature_columns, name="embeddings")(batch)
        embeds = emb.sparse_stack()  # [B, F, k]
        if self.use_fgcnn:
            extra = FGCNN(name="fgcnn")(embeds)
            embeds = jnp.concatenate([embeds, extra], axis=1)

        B = embeds.shape[0]
        parts = [embeds.reshape(B, -1)]
        if self.mode in ("inner", "both"):
            parts.append(pairwise_inner(embeds))
        if self.mode in ("outer", "both"):
            parts.append(OuterProductLayer(name="outer")(embeds))
        if emb.dense is not None:
            parts.append(emb.dense)
        x = jnp.concatenate(parts, axis=-1)
        return DNN(self.hidden_units, activation=self.activation,
                   dtype=self.dnn_dtype,
                   dropout_rate=self.dropout_rate, output_dim=1,
                   name="deep")(x, train=train)  # logits [B, 1]
