"""MMOE — multi-gate mixture-of-experts multi-task model.

TPU-native re-design of ``model/mmoe.py:10-32``: shared bottom input (either raw
features through the embedding collection, or a plain dense tensor like the
reference's driver), ``MMoELayer`` expert/gate einsums, per-task towers.
Returns a list of per-task logits ``[B, 1]``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers.embedding import EmbeddingCollection
from ..layers.interaction import MMoELayer, TowerLayer
from ..utils.features import FeatureColumn


class MMOE(nn.Module):
    num_tasks: int = 2
    num_experts: int = 4
    expert_units: int = 16
    tower_hidden_units: Sequence[int] = (8,)
    feature_columns: Optional[Tuple[FeatureColumn, ...]] = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        if self.feature_columns is not None:
            emb = EmbeddingCollection(self.feature_columns,
                                      name="embeddings")(batch)
            x = emb.concat_flat()
        else:
            x = batch  # raw dense tensor (reference driver, model/mmoe.py:45-50)
        task_inputs = MMoELayer(self.num_experts, self.expert_units,
                                self.num_tasks, name="mmoe")(x)
        return [
            TowerLayer(self.tower_hidden_units, 1, name=f"tower_{t}")(task_inputs[t])
            for t in range(self.num_tasks)
        ]
