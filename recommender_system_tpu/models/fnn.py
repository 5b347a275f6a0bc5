"""FNN — FM-pretrained embeddings feeding a DNN (two-stage training).

TPU-native re-design of ``model/fnn.py:13-71``: stage 1 trains an FM; stage 2
initializes this model's embedding tables from the FM's factor vectors
(the reference extracts ``model.variables[2]`` and forms ``x (x) v`` by hand,
``model/fnn.py:51-54``) and trains the DNN. With our shared stacked-table layout
the handoff is a literal param copy — see ``init_from_fm``.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers.core import DNN
from ..layers.embedding import EmbeddingCollection
from ..utils.features import FeatureColumn


class FNN(nn.Module):
    feature_columns: Tuple[FeatureColumn, ...]
    hidden_units: Sequence[int] = (256, 128, 64)
    activation: str = "relu"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        emb = EmbeddingCollection(self.feature_columns, name="embeddings")(batch)
        return DNN(self.hidden_units, activation=self.activation,
                   dropout_rate=self.dropout_rate, output_dim=1,
                   name="deep")(emb.concat_flat(), train=train)  # logits [B, 1]


def init_from_fm(fnn_variables, fm_variables):
    """Copy the FM's trained factor tables into a freshly-initialized FNN.

    Both models name their fused tables ``embeddings/table_d{k}``, so the FM ->
    FNN pretraining handoff (``model/fnn.py:51-54``) is a pytree param copy.
    Returns new FNN variables.
    """
    import flax

    fnn = flax.core.unfreeze(fnn_variables)
    fm_tables = fm_variables["params"]["embeddings"]
    for key, val in fm_tables.items():
        if key in fnn["params"]["embeddings"]:
            assert fnn["params"]["embeddings"][key].shape == val.shape, key
            fnn["params"]["embeddings"][key] = val
    return flax.core.freeze(fnn) if isinstance(fnn_variables, flax.core.FrozenDict) else fnn
