"""AFM (Attentional Factorization Machine) — attention over pairwise interactions.

TPU-native re-design of ``model/afm.py:10-18`` + ``AFMLayer``
(``layer/interaction.py:322-351``): field embeddings -> all pairwise element-wise
products (static pair gather) -> att/avg/max pooling -> Dense(1). The reference
omits the paper's first-order term; ``use_linear`` adds it (default on, the
intended AFM).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers.embedding import EmbeddingCollection, UnifiedEmbedding
from ..layers.interaction import AFMAttention
from ..ops.interactions import pairwise_product
from ..utils.features import FeatureColumn


class AFM(nn.Module):
    feature_columns: Tuple[FeatureColumn, ...]
    mode: str = "att"  # 'att' | 'avg' | 'max'
    attention_units: int = 8
    use_linear: bool = True

    @nn.compact
    def __call__(self, batch, train: bool = False):
        if self.use_linear:
            emb, linear_logit = UnifiedEmbedding(self.feature_columns,
                                                 name="unified")(batch)
        else:
            emb = EmbeddingCollection(self.feature_columns,
                                      name="embeddings")(batch)
            linear_logit = None
        pairs = pairwise_product(emb.sparse_stack())  # [B, P, k]
        if self.mode == "avg":
            pooled = jnp.mean(pairs, axis=1)
        elif self.mode == "max":
            pooled = jnp.max(pairs, axis=1)
        else:
            pooled = AFMAttention(self.attention_units, name="attention")(pairs)
        logit = nn.Dense(1, name="head")(pooled)
        if linear_logit is not None:
            logit = logit + linear_logit
        return logit  # logits [B, 1]
