"""FFM — Field-aware Factorization Machine.

TPU-native re-design of ``model/ffm.py:14-23`` + ``FFMLayer``
(``layer/interaction.py:117-163``). The reference one-hots every categorical
in-graph and keeps a ``[feature_num, field_num, k]`` factor tensor with an O(F^2)
Python pair loop. Here each feature's field-aware factors live in an embedding of
dim ``field_num * k`` (one fused gather, never materializing one-hots), and the
pairwise sum is a vectorized gather over static pair indices
(``ops.interactions.ffm_interaction``). Dense features get value-scaled factor
tensors, matching their role in the one-hot formulation.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers.embedding import EmbeddingCollection, LinearEmbedding
from ..ops.interactions import ffm_interaction
from ..utils.features import FeatureColumn, split_columns


class FFM(nn.Module):
    feature_columns: Tuple[FeatureColumn, ...]
    factor_dim: int = 4

    @nn.compact
    def __call__(self, batch, train: bool = False):
        sparse_cols, varlen_cols, dense_cols = split_columns(self.feature_columns)
        if varlen_cols:
            raise ValueError("FFM supports sparse + dense columns only")
        n_dense = sum(c.dimension for c in dense_cols)
        n_fields = len(sparse_cols) + n_dense
        k = self.factor_dim

        linear = LinearEmbedding(self.feature_columns, name="linear")(batch)

        # Field-aware factors: one embedding of dim n_fields*k per sparse feature.
        ffm_cols = tuple(
            dataclasses.replace(fc, embedding_dim=n_fields * k,
                                embedding_name=f"ffm_{fc.embedding_name}")
            for fc in sparse_cols)
        emb = EmbeddingCollection(ffm_cols, name="field_embeddings")(batch)
        B = next(iter(batch.values())).shape[0]
        field_embeds = [emb.sparse[fc.name].reshape(B, n_fields, k)
                        for fc in ffm_cols]

        if dense_cols:
            dense = jnp.concatenate(
                [batch[c.name].reshape(B, -1) for c in dense_cols], axis=-1)
            dense_v = self.param("dense_factors", nn.initializers.normal(1e-4),
                                 (n_dense, n_fields, k))
            for d in range(n_dense):
                field_embeds.append(dense[:, d, None, None] * dense_v[d][None])

        stacked = jnp.stack(field_embeds, axis=1)  # [B, F, F, k]
        return linear + ffm_interaction(stacked)
