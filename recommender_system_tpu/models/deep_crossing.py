"""DeepCrossing — embeddings + stack of residual units.

TPU-native re-design of ``model/deepCrossing.py:15-32``: fused embedding lookup,
concat with dense, N residual MLP blocks (``ResLayer``,
``layer/interaction.py:261-278``), linear head.
"""
from __future__ import annotations

from typing import Sequence, Tuple

from flax import linen as nn

from ..layers.embedding import EmbeddingCollection
from ..layers.interaction import ResBlock
from ..utils.features import FeatureColumn


class DeepCrossing(nn.Module):
    feature_columns: Tuple[FeatureColumn, ...]
    hidden_units: Sequence[int] = (256, 128)
    num_res_blocks: int = 3

    @nn.compact
    def __call__(self, batch, train: bool = False):
        emb = EmbeddingCollection(self.feature_columns, name="embeddings")(batch)
        x = emb.concat_flat()
        for i in range(self.num_res_blocks):
            x = ResBlock(self.hidden_units, name=f"res_{i}")(x)
        return nn.Dense(1, name="head")(x)  # logits [B, 1]
