"""Collaborative filtering (ItemCF / UserCF) — vectorized numpy/jax.

Capability parity with ``model/cf.py:14-76`` and the similarity helpers
(``layer/utils.py:153-203``), redesigned from per-pair Python loops into full
pairwise similarity matrices (one gram matmul for pearson; broadcasted norms for
euclidean) — the same vectorization that would run on the MXU at scale.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def euclidean_sim(matrix: np.ndarray) -> np.ndarray:
    """Pairwise euclidean distances between rows (lower = more similar;
    parity with ``getDistEuclidean``, ``layer/utils.py:158-162``)."""
    m = np.asarray(matrix, np.float64)
    sq = (m * m).sum(1)
    d2 = np.maximum(sq[:, None] + sq[None, :] - 2 * m @ m.T, 0.0)
    return np.sqrt(d2)


def pearson_sim(matrix: np.ndarray) -> np.ndarray:
    """Pairwise pearson correlation between rows (higher = more similar;
    parity with ``calcPearson``, ``layer/utils.py:165-191``)."""
    m = np.asarray(matrix, np.float64)
    centered = m - m.mean(1, keepdims=True)
    cov = centered @ centered.T
    std = np.sqrt((centered * centered).sum(1))
    denom = std[:, None] * std[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = np.where(denom > 0, cov / denom, 0.0)
    return sim


def _sim(matrix, t: str) -> np.ndarray:
    if t == "euc":
        return euclidean_sim(matrix)
    if t == "pea":
        return pearson_sim(matrix)
    raise ValueError("t must be 'euc' or 'pea'")


def top_k(candidates: Sequence[Tuple], k: int) -> List:
    """Top-k by score descending (parity: heap ``top_k``, ``layer/utils.py:194``).
    candidates: iterable of (name, score)."""
    return sorted(candidates, key=lambda c: -c[1])[:k]


class ItemCF:
    """Item-based CF: recommend unseen items most similar to consumed ones
    (``model/cf.py:14-37``)."""

    def __init__(self, users: list, items: list, matrix, t: str = "euc"):
        self.users, self.items = users, items
        self.matrix = np.asarray(matrix, np.float64)
        self.t = t
        self.item_sim = _sim(self.matrix.T, t)

    def recommend(self, user, k: int) -> List:
        u = self.users.index(user)
        consumed = self.matrix[u] > 0
        if self.t == "euc":
            # distance to the user's consumed set; smaller = better
            score = self.item_sim[:, consumed].mean(1)
            cand = [(self.items[i], -score[i])
                    for i in range(len(self.items)) if not consumed[i]]
        else:
            score = self.item_sim[:, consumed].mean(1)
            cand = [(self.items[i], score[i])
                    for i in range(len(self.items)) if not consumed[i]]
        return top_k(cand, k)


class UserCF:
    """User-based CF: score unseen items by top-k1 similar users' interactions
    (``model/cf.py:40-76``)."""

    def __init__(self, users: list, items: list, matrix, t: str = "euc"):
        self.users, self.items = users, items
        self.matrix = np.asarray(matrix, np.float64)
        self.t = t
        self.user_sim = _sim(self.matrix, t)

    def recommend(self, user, k1: int, k2: int) -> List:
        u = self.users.index(user)
        if self.t == "euc":
            # weight = 1/distance (model/cf.py:66); exclude self
            others = [(i, 1.0 / max(self.user_sim[u, i], 1e-12))
                      for i in range(len(self.users)) if i != u]
        else:
            others = [(i, self.user_sim[u, i])
                      for i in range(len(self.users)) if i != u]
        neighbors = top_k(others, k1)
        score = np.zeros(len(self.items))
        for idx, w in neighbors:
            score += self.matrix[idx] * w
        unseen = self.matrix[u] == 0
        cand = [(self.items[i], score[i])
                for i in range(len(self.items)) if unseen[i]]
        return top_k(cand, k2)
