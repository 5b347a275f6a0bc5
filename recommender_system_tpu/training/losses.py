"""Loss functions: BCE, in-batch sampled softmax with log-Q, negative sampling.

Replaces the reference's loss layer zoo: keras ``binary_crossentropy``
(``utils/compile_fit.py:13``), ``InBatchSoftmaxLayer`` (``layer/activation.py:267-285``),
``inbatch_softmax_cross_entropy_with_logits`` log-Q correction
(``layer/utils.py:206-215``), and the ``NegativeSampler`` config
(``utils/negative.py:18-38``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, labels: jax.Array,
                    weights: Optional[jax.Array] = None) -> jax.Array:
    """Numerically-stable binary cross entropy from logits (mean scalar)."""
    logits = logits.reshape(-1)
    labels = labels.reshape(-1).astype(logits.dtype)
    per = jax.nn.softplus(logits) - labels * logits
    if weights is not None:
        w = weights.reshape(-1).astype(logits.dtype)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(per)


@dataclasses.dataclass(frozen=True)
class NegativeSampler:
    """Sampling config (parity: ``utils/negative.py:18-38``).

    sampler: 'inbatch' | 'uniform' | 'frequency' | 'adaptive'
    item_probs: empirical item frequency distribution [n_items] (used for the
        log-Q correction and frequency-based sampling; distortion flattens it).

    'adaptive' is TF's learned-unigram sampler (the reference enumerates it at
    ``utils/negative.py:30`` but never wires it): the proposal distribution is
    learned online from the positive items actually seen during training.
    State is functional — initialize with :func:`init_adaptive_counts`, fold
    each batch's positives in with :func:`update_adaptive_counts`, and pass
    the counts to :func:`sampled_softmax_loss`.
    """

    sampler: str = "inbatch"
    num_sampled: int = 255
    item_probs: Optional[np.ndarray] = None
    distortion: float = 1.0


def init_adaptive_counts(n_items: int) -> jax.Array:
    """Learned-unigram state: start at 1 per item (uniform proposal)."""
    return jnp.ones((n_items,), jnp.float32)


def update_adaptive_counts(counts: jax.Array, pos_ids: jax.Array) -> jax.Array:
    """Fold one batch of observed positive item ids into the unigram counts."""
    return counts.at[pos_ids.reshape(-1)].add(1.0)


def inbatch_softmax_loss(
    user_emb: jax.Array,
    item_emb: jax.Array,
    item_ids: jax.Array,
    item_probs: Optional[jax.Array] = None,
    temperature: float = 1.0,
) -> jax.Array:
    """In-batch sampled softmax with log-Q correction.

    ``logits = (U / temperature) @ V^T``, corrected by subtracting ``log q(item)``
    of each candidate (``layer/utils.py:206-215``); label for row i is item i.
    Duplicate items of the same id elsewhere in the batch are masked out of the
    denominator (an improvement over the reference, which treats them as
    negatives).
    """
    u = user_emb / temperature
    logits = jnp.dot(u, item_emb.T, preferred_element_type=jnp.float32)  # [B, B]
    if item_probs is not None:
        q = jnp.take(item_probs, item_ids.reshape(-1), axis=0)
        logits = logits - jnp.log(jnp.clip(q, 1e-12, None))[None, :]
    ids = item_ids.reshape(-1)
    same = ids[None, :] == ids[:, None]
    eye = jnp.eye(logits.shape[0], dtype=bool)
    logits = jnp.where(same & ~eye, -1e9, logits)  # mask duplicate positives
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.diagonal(log_probs))


def sampled_softmax_loss(
    user_emb: jax.Array,
    item_table: jax.Array,
    pos_ids: jax.Array,
    sampler: NegativeSampler,
    rng: jax.Array,
    temperature: float = 1.0,
    adaptive_counts: Optional[jax.Array] = None,
) -> jax.Array:
    """Uniform / frequency / adaptive negative sampling against the item table.

    Draws ``num_sampled`` negatives per batch (shared across rows — the standard
    sampled-softmax trick), with optional distortion-flattened frequency sampling,
    and applies the log-Q correction for the chosen proposal distribution.
    'adaptive' (learned unigram, ``utils/negative.py:30``) samples from the
    ``adaptive_counts`` state maintained by :func:`update_adaptive_counts`.
    """
    n_items = item_table.shape[0]
    if sampler.sampler == "adaptive":
        if adaptive_counts is None:
            raise ValueError("adaptive sampling needs adaptive_counts "
                             "(init_adaptive_counts / update_adaptive_counts)")
        p = adaptive_counts ** sampler.distortion
        p = p / jnp.sum(p)
        neg_ids = jax.random.categorical(
            rng, jnp.log(jnp.clip(p, 1e-12, None)),
            shape=(sampler.num_sampled,))
        log_q_neg = jnp.log(jnp.clip(p[neg_ids], 1e-12, None))
        log_q_pos = jnp.log(jnp.clip(p[pos_ids.reshape(-1)], 1e-12, None))
    elif sampler.sampler == "frequency" and sampler.item_probs is not None:
        p = jnp.asarray(sampler.item_probs) ** sampler.distortion
        p = p / jnp.sum(p)
        neg_ids = jax.random.categorical(
            rng, jnp.log(jnp.clip(p, 1e-12, None)), shape=(sampler.num_sampled,))
        log_q_neg = jnp.log(jnp.clip(p[neg_ids], 1e-12, None))
        log_q_pos = jnp.log(jnp.clip(p[pos_ids.reshape(-1)], 1e-12, None))
    else:
        neg_ids = jax.random.randint(rng, (sampler.num_sampled,), 1, n_items)
        log_q = -jnp.log(float(n_items - 1))
        log_q_neg = jnp.full((sampler.num_sampled,), log_q)
        log_q_pos = jnp.full(pos_ids.reshape(-1).shape, log_q)

    u = user_emb / temperature
    pos_vec = jnp.take(item_table, pos_ids.reshape(-1), axis=0)  # [B, d]
    neg_vec = jnp.take(item_table, neg_ids, axis=0)  # [S, d]
    pos_logit = jnp.sum(u * pos_vec, axis=-1, keepdims=True) - log_q_pos[:, None]
    neg_logit = jnp.dot(u, neg_vec.T,
                        preferred_element_type=jnp.float32) - log_q_neg[None, :]
    logits = jnp.concatenate([pos_logit, neg_logit], axis=-1)  # [B, 1+S]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(log_probs[:, 0])
