"""Logistic regression with minibatch gradient descent and three stop criteria.

TPU-native re-design of the reference's pure-numpy LR (``model/lr.py:12-100``):
the descent step is a jitted jax function; the loop supports the same stopping
rules — max iterations, cost-delta threshold, gradient-norm threshold — and
per-epoch shuffling.
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

STOP_ITER = "iter"
STOP_COST = "cost"
STOP_GRAD = "grad"


@jax.jit
def _cost(theta, X, y):
    logits = X @ theta
    # stable BCE on sigmoid(logits) (model/lr.py cost function)
    return jnp.mean(jax.nn.softplus(logits) - y * logits)


@jax.jit
def _step(theta, X, y, lr):
    def loss(t):
        return _cost(t, X, y)

    g = jax.grad(loss)(theta)
    return theta - lr * g, g


def fit_logistic_regression(
    X: np.ndarray,
    y: np.ndarray,
    batch_size: int = 16,
    lr: float = 0.001,
    stop_type: str = STOP_ITER,
    thresh: float = 5000,
    add_intercept: bool = True,
    seed: int = 0,
) -> Tuple[np.ndarray, List[float]]:
    """Returns (theta, cost history). Parity with ``descent`` (``model/lr.py:55-97``)."""
    if add_intercept:
        X = np.concatenate([np.ones((len(X), 1), X.dtype), X], axis=1)
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    theta = jnp.zeros((X.shape[1],), jnp.float32)
    costs = [float(_cost(theta, X, y))]
    i, k = 0, 0
    perm = rng.permutation(n)
    while True:
        sel = perm[k: k + batch_size]
        if len(sel) < batch_size:
            perm = rng.permutation(n)
            k = 0
            sel = perm[:batch_size]
        k += batch_size
        theta, g = _step(theta, X[sel], y[sel], lr)
        costs.append(float(_cost(theta, X, y)))
        i += 1
        if stop_type == STOP_ITER and i >= thresh:
            break
        if stop_type == STOP_COST and abs(costs[-1] - costs[-2]) < thresh:
            break
        if stop_type == STOP_GRAD and float(jnp.linalg.norm(g)) < thresh:
            break
    return np.asarray(theta), costs


def predict_proba(theta: np.ndarray, X: np.ndarray,
                  add_intercept: bool = True) -> np.ndarray:
    if add_intercept:
        X = np.concatenate([np.ones((len(X), 1), X.dtype), X], axis=1)
    return np.asarray(jax.nn.sigmoid(jnp.asarray(X) @ jnp.asarray(theta)))
