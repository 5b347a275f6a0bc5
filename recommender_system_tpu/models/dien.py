"""DIEN (Deep Interest Evolution Network) — GRU interest extraction + AUGRU evolution.

TPU-native re-design of ``model/dien.py:83-169``:

1. behavior embeddings -> GRU (``lax.scan``; replaces keras GRU at
   ``model/dien.py:65``) producing per-step interest states,
2. optional **auxiliary loss** supervising each interest state against the next
   clicked item (positive) and a sampled negative (``auxiliary_loss``,
   ``model/dien.py:20-51``),
3. target attention scores over the interest states
   (``AttentionSequencePoolingLayer(return_score=True)``, ``model/dien.py:74-76``),
4. AUGRU (attention-gated scan, replaces the python-unrolled ``rnn_augru`` loop at
   ``layer/activation.py:145-264``) whose final state joins the deep input.

``__call__`` returns ``(logits [B,1], aux_loss scalar)``; the trainer adds
``alpha * aux_loss`` (parity with ``model.add_loss``, ``model/dien.py:163-164``).

Batch keys: target sparse feats, ``hist_<name>`` varlen history, optional
``neg_hist_<name>`` varlen negative history.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers.core import DNN, PredictionLayer
from ..layers.embedding import EmbeddingCollection
from ..layers.sequence import AUGRULayer, DinAttention, GRULayer
from ..utils.features import FeatureColumn


class AuxiliaryNet(nn.Module):
    """Per-step click classifier for the auxiliary loss (``model/dien.py:20-37``):
    sigmoid(DNN(concat(state, item_embed))) with a (100, 50) tower."""

    hidden_units: Sequence[int] = (100, 50)
    # compute dtype for the towers (params stay f32; logits return f32)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, states, item_embeds):  # [B, T, H], [B, T, K]
        x = jnp.concatenate([states, item_embeds], axis=-1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, units in enumerate(self.hidden_units):
            x = jax.nn.sigmoid(nn.Dense(units, dtype=self.dtype,
                                        name=f"dense_{i}")(x))
        return nn.Dense(1, name="out")(
            x.astype(jnp.float32))[..., 0]  # logits [B, T]


class DIEN(nn.Module):
    feature_columns: Tuple[FeatureColumn, ...]
    behavior_feature_list: Tuple[str, ...] = ("item_id",)
    gru_hidden: int = 0  # 0 -> use behavior embedding width
    att_hidden_units: Sequence[int] = (80, 40)
    att_activation: str = "sigmoid"
    # masked-softmax normalize attention scores before AUGRU (parity with the
    # reference model-level default, model/dien.py:86; keeps scores in [0,1]
    # so the attention-scaled update u = att*(1-z) stays a convex blend)
    att_weight_normalization: bool = True
    hidden_units: Sequence[int] = (256, 128, 64)
    activation: str = "relu"
    dropout_rate: float = 0.0
    # deep-tower compute dtype ('bfloat16' on TPU; params/logits stay f32)
    dnn_dtype: Optional[Any] = None
    use_negsampling: bool = False

    @nn.compact
    def __call__(self, batch, train: bool = False):
        emb = EmbeddingCollection(self.feature_columns, name="embeddings")(batch)

        query = jnp.concatenate(
            [emb.sparse[n] for n in self.behavior_feature_list], axis=-1)
        hist_names = [f"hist_{n}" for n in self.behavior_feature_list]
        keys = jnp.concatenate([emb.varlen_raw[h] for h in hist_names], axis=-1)
        mask = emb.varlen_mask[hist_names[0]]  # [B, T]

        hidden = self.gru_hidden or keys.shape[-1]
        # 1. interest extraction
        states, _ = GRULayer(hidden, dtype=self.dnn_dtype,
                             name="interest_gru")(keys, mask=mask)

        # attention queries score against the GRU states; project the target
        # embedding to the state width when a custom gru_hidden differs
        att_query = query
        if hidden != keys.shape[-1]:
            att_query = nn.Dense(hidden, name="query_proj")(query)

        # 2. auxiliary loss on shifted positives/negatives (model/dien.py:38-51)
        aux_loss = jnp.float32(0.0)
        neg_names = [f"neg_hist_{n}" for n in self.behavior_feature_list]
        if self.use_negsampling and not all(
                n in emb.varlen_raw for n in neg_names):
            raise ValueError(
                f"use_negsampling=True but batch/columns lack {neg_names}; "
                f"provide neg_hist_* varlen columns (e.g. "
                f"build_behavior_dataset(negsample=True)) or disable it")
        if self.use_negsampling:
            neg_keys = jnp.concatenate(
                [emb.varlen_raw[n] for n in neg_names], axis=-1)
            aux_net = AuxiliaryNet(dtype=self.dnn_dtype, name="aux_net")
            h = states[:, :-1, :]          # h_t
            pos = keys[:, 1:, :]           # clicked e_{t+1}
            neg = neg_keys[:, 1:, :]       # sampled non-click
            m = mask[:, 1:].astype(jnp.float32)
            pos_logit = aux_net(h, pos)
            neg_logit = aux_net(h, neg)
            ce = (jax.nn.softplus(-pos_logit) + jax.nn.softplus(neg_logit)) * m
            aux_loss = jnp.sum(ce) / jnp.maximum(jnp.sum(m), 1.0)

        # 3. attention scores over interest states
        att_scores = DinAttention(
            hidden_units=self.att_hidden_units, activation=self.att_activation,
            weight_normalization=self.att_weight_normalization,
            return_score=True, dtype=self.dnn_dtype,
            name="attention")(att_query, states, mask, train=train)  # [B, T]

        # 4. interest evolution
        _, final_state = AUGRULayer(hidden, dtype=self.dnn_dtype,
                                    name="augru")(
            states, att_scores, mask=mask)

        other = [v for n, v in emb.sparse.items()
                 if n not in self.behavior_feature_list]
        other += [v for n, v in emb.pooled.items()
                  if n not in hist_names + neg_names]
        parts = other + [query, final_state]
        if emb.dense is not None:
            parts.append(emb.dense)
        x = jnp.concatenate(parts, axis=-1)
        logit = DNN(self.hidden_units, activation=self.activation,
                    dtype=self.dnn_dtype,
                    dropout_rate=self.dropout_rate, output_dim=1,
                    name="deep")(x, train=train)
        logit = PredictionLayer(name="prediction")(logit, logits=True)
        return logit, aux_loss
