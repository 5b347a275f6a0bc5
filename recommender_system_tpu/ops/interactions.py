"""Feature-interaction math: FM, bi-interaction, pairwise products, cross network.

Pure-jax reference implementations (XLA already fuses these well on TPU); the hot
configs additionally have hand-written Pallas kernels in ``ops/pallas_kernels.py``
selected via ``recommender_system_tpu.ops.dispatch``.

Semantics match the reference layers cited per-function, with the layout redesigned
for the MXU: pairwise interactions go through batched gram matrices
(one ``[B,F,k] x [B,k,F]`` matmul) instead of the reference's per-pair Python loops
and gathers (``layer/interaction.py:166-215,281-297``).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def fm_interaction(x: jax.Array, v: jax.Array) -> jax.Array:
    """Second-order FM term on a dense/one-hot input.

    ``0.5 * sum((x v)^2 - x^2 v^2, axis=-1)`` — the O(Dk) identity used by
    ``FMLayer.call`` (``layer/interaction.py:106-113``).

    Args:  x ``[B, D]``, v ``[D, k]``.   Returns ``[B, 1]``.
    """
    xv = jnp.dot(x, v, preferred_element_type=jnp.float32)           # [B, k]
    x2v2 = jnp.dot(x * x, v * v, preferred_element_type=jnp.float32)  # [B, k]
    return 0.5 * jnp.sum(xv * xv - x2v2, axis=-1, keepdims=True)


def bi_interaction(embeds: jax.Array) -> jax.Array:
    """NFM bi-interaction pooling over stacked field embeddings.

    ``0.5 * ((sum_f e_f)^2 - sum_f e_f^2)`` (``model/nfm.py:28``). Equals the
    row-sum over all pairwise element-wise products.

    Args: embeds ``[B, F, k]``.  Returns ``[B, k]``.
    """
    sum_sq = jnp.square(jnp.sum(embeds, axis=1))
    sq_sum = jnp.sum(jnp.square(embeds), axis=1)
    return 0.5 * (sum_sq - sq_sum)


def _pair_indices(num_fields: int):
    row, col = np.triu_indices(num_fields, k=1)
    return row.astype(np.int32), col.astype(np.int32)


def pairwise_inner(embeds: jax.Array) -> jax.Array:
    """All-pairs inner products <e_i, e_j>, i<j (PNN IPNN).

    The reference gathers row/col lists then multiplies
    (``layer/interaction.py:166-183``); here a single batched gram matmul
    ``e @ e^T`` feeds the MXU and the upper triangle is sliced out.

    Args: embeds ``[B, F, k]``.  Returns ``[B, F*(F-1)/2]``.
    """
    gram = jnp.einsum("bfk,bgk->bfg", embeds, embeds,
                      preferred_element_type=jnp.float32)
    row, col = _pair_indices(embeds.shape[1])
    return gram[:, row, col]


def pairwise_product(embeds: jax.Array) -> jax.Array:
    """All-pairs element-wise products e_i * e_j, kept as a sequence (AFM).

    Parity with ``InteractionLayer`` (``layer/interaction.py:281-297``).

    Args: embeds ``[B, F, k]``.  Returns ``[B, P, k]`` with P = F(F-1)/2.
    """
    row, col = _pair_indices(embeds.shape[1])
    return embeds[:, row, :] * embeds[:, col, :]


def pairwise_outer(embeds: jax.Array, kernel: jax.Array) -> jax.Array:
    """PNN OPNN kernel-weighted outer products.

    ``out[b,p] = sum_ij e_row[b,p,i] * W[j,p,i] * e_col[b,p,j]`` — the einsum form
    of ``OuterProductLayer.call`` (``layer/interaction.py:205-214``).

    Args: embeds ``[B, F, k]``, kernel ``[k, P, k]``.  Returns ``[B, P]``.
    """
    row, col = _pair_indices(embeds.shape[1])
    p = embeds[:, row, :]  # [B, P, k]
    q = embeds[:, col, :]  # [B, P, k]
    return jnp.einsum("bpi,jpi,bpj->bp", p, kernel, q,
                      preferred_element_type=jnp.float32)


def cross_network(x0: jax.Array, weights: jax.Array, biases: jax.Array) -> jax.Array:
    """DCN cross network: ``x_{l+1} = x0 * (x_l . w_l) + b_l + x_l``.

    Rank-1 cross per layer, matching ``CrossLayer.call``
    (``layer/interaction.py:77-83``) where ``x_l . w_l`` is a per-row scalar.

    Args: x0 ``[B, D]``, weights ``[L, D]``, biases ``[L, D]``.  Returns ``[B, D]``.
    """

    def step(x, wb):
        w, b = wb
        xw = jnp.dot(x, w, preferred_element_type=jnp.float32)  # [B]
        return x0 * xw[:, None] + b[None, :] + x, None

    out, _ = jax.lax.scan(step, x0, (weights, biases))
    return out


def ffm_interaction(field_embeds: jax.Array) -> jax.Array:
    """Field-aware FM second-order term from per-feature field embeddings.

    ``field_embeds[b, i, j, :]`` is feature i's latent vector *toward field j*
    (the gather-form of the reference's one-hot ``tf.tensordot(x, v)``,
    ``layer/interaction.py:152-162`` — we never materialize the one-hot).
    Interaction = ``sum_{i<j} <v_{i,j}, v_{j,i}>``.

    Args: field_embeds ``[B, F, F, k]``.  Returns ``[B, 1]``.
    """
    F = field_embeds.shape[1]
    row, col = _pair_indices(F)
    vi = field_embeds[:, row, col, :]  # feature i toward field j
    vj = field_embeds[:, col, row, :]  # feature j toward field i
    return jnp.sum(vi * vj, axis=(-1, -2))[:, None]
