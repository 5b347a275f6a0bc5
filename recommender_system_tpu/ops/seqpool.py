"""Masked variable-length sequence pooling and weighting.

TPU-native replacement for ``SequencePoolingLayer`` / ``WeightedSequenceLayer``
(``/root/reference/algorithm/deep_learning/layer/sequence.py:21-175``): all ops are
static-shape masked reductions (no ragged tensors), vectorized over ``[B, T, k]``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -(2.0 ** 32) + 1  # reference padding constant, layer/sequence.py:152 etc.


def length_mask(lengths: jax.Array, maxlen: int) -> jax.Array:
    """``[B] -> [B, T]`` boolean mask (``tf.sequence_mask`` parity)."""
    pos = jnp.arange(maxlen)[None, :]
    return pos < lengths.reshape(-1, 1)


def id_mask(ids: jax.Array) -> jax.Array:
    """mask-zero semantics: id 0 is padding (``utils/inputs.py:39`` mask_zero)."""
    return ids != 0


def sequence_pooling(
    seq_embeds: jax.Array,
    mask: jax.Array,
    mode: str = "mean",
    eps: float = 1e-8,
) -> jax.Array:
    """Masked sum/mean/max pooling over the time axis.

    Parity with ``SequencePoolingLayer.call`` (``layer/sequence.py:57-86``):
    mean divides by the true length (+eps), max uses -inf padding.

    Args: seq_embeds ``[B, T, k]``, mask ``[B, T]`` bool.  Returns ``[B, k]``.
    """
    m = mask.astype(seq_embeds.dtype)[..., None]  # [B, T, 1]
    if mode == "max":
        neg = (1.0 - m) * NEG_INF
        return jnp.max(seq_embeds + neg, axis=1)
    s = jnp.sum(seq_embeds * m, axis=1)
    if mode == "sum":
        return s
    if mode == "mean":
        lengths = jnp.sum(m, axis=1)  # [B, 1]
        return s / (lengths + eps)
    raise ValueError(f"mode must be sum|mean|max, got {mode}")


def weighted_sequence(
    seq_embeds: jax.Array,
    weights: jax.Array,
    mask: jax.Array,
    normalize: bool = True,
) -> jax.Array:
    """Apply per-position weights, optionally softmax-normalized over valid steps.

    Parity with ``WeightedSequenceLayer.call`` (``layer/sequence.py:139-164``).

    Args: seq_embeds ``[B, T, k]``, weights ``[B, T]``, mask ``[B, T]`` bool.
    Returns ``[B, T, k]``.
    """
    if normalize:
        w = jnp.where(mask, weights, NEG_INF)
        w = jax.nn.softmax(w, axis=1)
    else:
        w = jnp.where(mask, weights, 0.0)
    return seq_embeds * w[..., None]


def masked_softmax(scores: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax with invalid positions forced to ~0 (reference -2**32+1 padding,
    ``layer/interaction.py:392-396``)."""
    return jax.nn.softmax(jnp.where(mask, scores, NEG_INF), axis=axis)
