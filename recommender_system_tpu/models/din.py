"""DIN (Deep Interest Network) — target attention over behavior sequences.

TPU-native re-design of ``model/din.py:15-95`` + the standalone ``Attention``
(``layer/interaction.py:355-406``). Behavior features are varlen columns named
``hist_<target>`` sharing the target's embedding table; the zero-id mask
(``model/din.py:80``) comes from the ids. Attention scoring / masked softmax /
pooling live in ``layers.sequence.DinAttention`` (Pallas-fusable).
"""
from __future__ import annotations

from typing import Optional, Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers.core import DNN
from ..layers.embedding import EmbeddingCollection
from ..layers.sequence import DinAttention
from ..utils.features import FeatureColumn, split_columns


class DIN(nn.Module):
    feature_columns: Tuple[FeatureColumn, ...]
    behavior_feature_list: Tuple[str, ...] = ("item_id",)
    att_hidden_units: Sequence[int] = (80, 40)
    att_activation: str = "sigmoid"
    hidden_units: Sequence[int] = (256, 128, 64)
    activation: str = "dice"
    dropout_rate: float = 0.0
    # deep-tower compute dtype ('bfloat16' on TPU; params/logits stay f32)
    dnn_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        emb = EmbeddingCollection(self.feature_columns, name="embeddings")(batch)

        query = jnp.concatenate(
            [emb.sparse[name] for name in self.behavior_feature_list], axis=-1)
        hist_names = [f"hist_{n}" for n in self.behavior_feature_list]
        keys = jnp.concatenate(
            [emb.varlen_raw[h] for h in hist_names], axis=-1)  # [B, T, K]
        mask = emb.varlen_mask[hist_names[0]]

        att_pooled = DinAttention(
            hidden_units=self.att_hidden_units, activation=self.att_activation,
            dtype=self.dnn_dtype,
            name="attention")(query, keys, mask, train=train)  # [B, K]

        other = [v for n, v in emb.sparse.items()
                 if n not in self.behavior_feature_list]
        other += [v for n, v in emb.pooled.items() if n not in hist_names]
        parts = other + [att_pooled, query]
        if emb.dense is not None:
            parts.append(emb.dense)
        x = jnp.concatenate(parts, axis=-1)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn")(x)
        return DNN(self.hidden_units, activation=self.activation,
                   dtype=self.dnn_dtype,
                   dropout_rate=self.dropout_rate, output_dim=1,
                   name="deep")(x, train=train)  # logits [B, 1]
