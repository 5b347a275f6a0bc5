"""FNN — FM-pretrained embeddings feeding a DNN (two-stage training).

TPU-native re-design of ``model/fnn.py:13-71``: stage 1 trains an FM; stage 2
initializes this model's embedding tables from the FM's factor vectors
(the reference extracts ``model.variables[2]`` and forms ``x (x) v`` by hand,
``model/fnn.py:51-54``) and trains the DNN. With our shared stacked-table layout
the handoff is a literal param copy — see ``init_from_fm``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

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
    # deep-tower compute dtype ('bfloat16' on TPU; params/logits stay f32)
    dnn_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        emb = EmbeddingCollection(self.feature_columns, name="embeddings")(batch)
        return DNN(self.hidden_units, activation=self.activation,
                   dtype=self.dnn_dtype,
                   dropout_rate=self.dropout_rate, output_dim=1,
                   name="deep")(emb.concat_flat(), train=train)  # logits [B, 1]


def init_from_fm(fnn_variables, fm_variables, feature_columns):
    """Copy the FM's trained factor vectors into a freshly-initialized FNN.

    The FM stores ``[v_1..v_d, w]`` rows in its unified d+1 stack
    (``UnifiedEmbedding``); the FNN uses plain d-dim stacks. The pretraining
    handoff (``model/fnn.py:51-54``) unpacks the FM stack, drops the linear
    lane, and repacks into the FNN layout. Returns new FNN variables.
    """
    import flax

    from ..layers.embedding import (build_table_specs, pack_stack,
                                    unpack_stack)

    fnn = flax.core.unfreeze(fnn_variables)
    fm_tables = fm_variables["params"]["unified"]["embeddings"]
    specs = build_table_specs(feature_columns)
    for dim, group in specs.items():
        total = sum(s.vocab for s in group.values())
        src_key, dst_key = f"table_d{dim + 1}", f"table_d{dim}"
        if src_key in fm_tables and dst_key in fnn["params"]["embeddings"]:
            logical = unpack_stack(fm_tables[src_key], total, dim + 1)[:, :dim]
            target_rows = fnn["params"]["embeddings"][dst_key].shape[0]
            fnn["params"]["embeddings"][dst_key] = pack_stack(
                logical, dim, rows=target_rows)
    return (flax.core.freeze(fnn)
            if isinstance(fnn_variables, flax.core.FrozenDict) else fnn)
