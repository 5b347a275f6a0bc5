"""FM — Factorization Machine over typed feature columns.

TPU-native re-design of ``/root/reference/algorithm/deep_learning/model/fm.py:14-23``
(+ ``FMLayer``, ``layer/interaction.py:86-114``). The reference one-hot-encodes the
26 Criteo categoricals and feeds a dense ``[B, D]`` matrix; here the identical math
is computed from embedding gathers (one fused stacked-table gather) — the second-
order term over a one-hot input is exactly the bi-interaction of the gathered
factor vectors, so no one-hot is ever materialized:

    0.5 * sum_k[(sum_f v_f)^2 - sum_f v_f^2]  ==  sum_{i<j} <v_i, v_j>

Dense features participate with their own factor vectors scaled by the value
(x_d * v_d), matching their role in the one-hot formulation.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers.embedding import UnifiedEmbedding
from ..ops.interactions import bi_interaction
from ..utils.features import FeatureColumn, split_columns


class FM(nn.Module):
    feature_columns: Tuple[FeatureColumn, ...]
    factor_dim: int = 0  # 0 -> use the sparse columns' embedding dim

    @nn.compact
    def __call__(self, batch, train: bool = False):
        sparse_cols, varlen_cols, dense_cols = split_columns(self.feature_columns)
        # fused first-order + factor lookup: one gather/scatter for both
        emb, linear = UnifiedEmbedding(self.feature_columns, name="unified")(batch)
        fields = [v[:, None, :] for v in emb.sparse.values()]
        fields += [v[:, None, :] for v in emb.pooled.values()]
        if emb.dense is not None:
            k = self.factor_dim or (sparse_cols + varlen_cols)[0].embedding_dim
            d = emb.dense.shape[-1]
            dense_v = self.param("dense_factors", nn.initializers.normal(1e-4),
                                 (d, k))
            fields.append(emb.dense[:, :, None] * dense_v[None, :, :])  # [B, D, k]
        stacked = jnp.concatenate(fields, axis=1)  # [B, F_total, k]
        second_order = jnp.sum(bi_interaction(stacked), axis=-1, keepdims=True)
        return linear + second_order  # logits [B, 1]
