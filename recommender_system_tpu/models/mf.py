"""Matrix factorization with masked SGD — jit-compiled full-matrix updates.

TPU-native re-design of ``model/md.py:12-82``: the reference runs a triple Python
loop per step (users x items x latent dims); here each step is one jitted
masked-gradient update ``P -= lr * d/dP ||mask*(R - PQ^T)||^2 + beta reg`` — the
same objective, vectorized. Stops on loss-delta < 1e-10 or loss < 1e-3
(parity with ``md.py:58-64``).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@jax.jit
def _loss(p, q, r, mask, beta):
    err = mask * (r - p @ q.T)
    # regularize only entries that participated (parity with md.py:50-53)
    reg = 0.5 * beta * (jnp.sum((p * p).sum(1)[:, None] * mask)
                        + jnp.sum((q * q).sum(1)[None, :] * mask))
    return jnp.sum(err * err) + reg


@jax.jit
def _step(p, q, r, mask, lr, beta):
    def obj(pq):
        return _loss(pq[0], pq[1], r, mask, beta)

    gp, gq = jax.grad(obj)((p, q))
    return p - lr * gp, q - lr * gq


def matrix_factorization(
    r: np.ndarray,
    latent_dim: int = 2,
    steps: int = 5000,
    lr: float = 0.0002,
    beta: float = 0.02,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, List[float]]:
    """Factorize ``r ~= P Q^T`` over observed (r>0) entries.

    Returns (P [n_users, k], Q [n_items, k], loss history).
    """
    rng = np.random.default_rng(seed)
    r = jnp.asarray(r, jnp.float32)
    mask = (r > 0).astype(jnp.float32)
    p = jnp.asarray(rng.random((r.shape[0], latent_dim)), jnp.float32)
    q = jnp.asarray(rng.random((r.shape[1], latent_dim)), jnp.float32)
    losses = []
    prev = None
    for _ in range(steps):
        p, q = _step(p, q, r, mask, lr, beta)
        cur = float(_loss(p, q, r, mask, beta))
        losses.append(cur)
        if prev is not None and abs(prev - cur) < 1e-10:
            break
        if cur < 1e-3:
            break
        prev = cur
    return np.asarray(p), np.asarray(q), losses


def recommend(user_idx: int, p: np.ndarray, q: np.ndarray, consumed_mask,
              items: list, k: int) -> list:
    """Top-k unseen items by latent dot product (``md.py:69-82``)."""
    scores = p[user_idx] @ q.T
    cand = [(items[i], float(scores[i]))
            for i in range(len(items)) if not consumed_mask[i]]
    return sorted(cand, key=lambda c: -c[1])[:k]
