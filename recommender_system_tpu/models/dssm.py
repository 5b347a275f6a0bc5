"""DSSM — two-tower retrieval with shared embeddings and in-batch softmax.

TPU-native re-design of ``model/dssm.py:17-90``: one shared ``EmbeddingCollection``
across both towers (``model/dssm.py:41-42``), per-tower DNNs, L2-normalized
embeddings. Loss lives in ``training.losses``: 'logistic' (inner product / temp ->
BCE) or 'softmax' (in-batch sampled softmax with log-Q correction,
``layer/utils.py:206-215``). ``user_embedding`` / ``item_embedding`` are the
export entry points for ANN retrieval (parity: ``model/dssm.py:158-163``).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers.core import DNN
from ..layers.embedding import EmbeddingCollection
from ..utils.features import FeatureColumn


def _tower_input(emb_out, columns):
    names = {c.name for c in columns}
    parts = [v for n, v in emb_out.sparse.items() if n in names]
    parts += [v for n, v in emb_out.pooled.items() if n in names]
    if emb_out.dense is not None:
        parts.append(emb_out.dense)
    return jnp.concatenate(parts, axis=-1)


class DSSM(nn.Module):
    user_columns: Tuple[FeatureColumn, ...]
    item_columns: Tuple[FeatureColumn, ...]
    user_hidden_units: Sequence[int] = (64, 32)
    item_hidden_units: Sequence[int] = (64, 32)
    embedding_l2_normalize: bool = True
    temperature: float = 0.05
    # tower compute dtype ('bfloat16' on TPU; params/embeddings stay f32)
    dnn_dtype: Optional[Any] = None

    def setup(self):
        self.embeddings = EmbeddingCollection(
            tuple(self.user_columns) + tuple(self.item_columns))
        self.user_dnn = DNN(self.user_hidden_units, activation="relu",
                            dtype=self.dnn_dtype,
                            name="user_tower")
        self.item_dnn = DNN(self.item_hidden_units, activation="relu",
                            dtype=self.dnn_dtype,
                            name="item_tower")

    def _normalize(self, x):
        if self.embedding_l2_normalize:
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return x

    def user_embedding(self, batch, train: bool = False):
        emb = self.embeddings(batch, columns=self.user_columns)
        return self._normalize(self.user_dnn(_tower_input(emb, self.user_columns),
                                             train=train))

    def item_embedding(self, batch, train: bool = False):
        emb = self.embeddings(batch, columns=self.item_columns)
        return self._normalize(self.item_dnn(_tower_input(emb, self.item_columns),
                                             train=train))

    def __call__(self, batch, train: bool = False):
        return (self.user_embedding(batch, train=train),
                self.item_embedding(batch, train=train))
