"""Classic algorithms: logistic regression, CF, matrix factorization."""
import os

import numpy as np
import pytest

from recommender_system_tpu.models.cf import ItemCF, UserCF, pearson_sim
from recommender_system_tpu.models.lr import (STOP_ITER,
                                              fit_logistic_regression,
                                              predict_proba)
from recommender_system_tpu.models.mf import matrix_factorization, recommend
from recommender_system_tpu.utils.datasets import REFERENCE_DATA_DIR, load_logireg
from recommender_system_tpu.utils.metrics import accuracy

USERS = ["User1", "User2", "User3", "User4", "User5"]
MOVIES = ["M1", "M2", "M3", "M4", "M5", "M6", "M7"]
# the reference's toy matrices (model/cf.py:83-100)
BINARY = [
    [1, 1, 1, 0, 1, 0, 0],
    [0, 1, 1, 0, 0, 1, 0],
    [1, 0, 1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1, 0, 0],
    [1, 1, 0, 1, 0, 1, 1],
]
RATINGS = [
    [3, 4, 5, 0, 3, 0, 0],
    [0, 4, 2, 0, 0, 5, 0],
    [1, 0, 3, 5, 3, 3, 2],
    [3, 3, 5, 1, 2, 0, 0],
    [5, 5, 0, 2, 0, 4, 5],
]


def test_logistic_regression_learns(rng):
    if os.path.exists(os.path.join(REFERENCE_DATA_DIR, "LogiReg_data.txt")):
        X, y = load_logireg()
        # normalize (the raw exam scores need scaling to converge with GD)
        X = (X - X.mean(0)) / X.std(0)
    else:
        X = rng.normal(size=(200, 2)).astype(np.float32)
        y = (X.sum(1) > 0).astype(np.float32)
    theta, costs = fit_logistic_regression(X, y, batch_size=16, lr=0.05,
                                           stop_type=STOP_ITER, thresh=1500)
    assert costs[-1] < costs[0]
    probs = predict_proba(theta, X)
    assert accuracy(y, probs) > 0.85


def test_usercf_recommends_unseen():
    d = UserCF(USERS, MOVIES, BINARY, "euc")
    recs = d.recommend("User1", 2, 2)
    seen = {MOVIES[i] for i, v in enumerate(BINARY[0]) if v}
    assert len(recs) == 2 and all(name not in seen for name, _ in recs)


def test_usercf_pearson():
    d = UserCF(USERS, MOVIES, RATINGS, "pea")
    recs = d.recommend("User1", 2, 2)
    assert len(recs) == 2


def test_itemcf_recommends_unseen():
    d = ItemCF(USERS, MOVIES, BINARY, "euc")
    recs = d.recommend("User2", 2)
    seen = {MOVIES[i] for i, v in enumerate(BINARY[1]) if v}
    assert len(recs) == 2 and all(name not in seen for name, _ in recs)


def test_pearson_sim_diagonal_is_one():
    sim = pearson_sim(np.asarray(RATINGS, float))
    np.testing.assert_allclose(np.diag(sim), 1.0, rtol=1e-9)


def test_matrix_factorization_reconstructs():
    r = np.asarray(RATINGS, np.float32)
    p, q, losses = matrix_factorization(r, latent_dim=3, steps=3000, lr=0.01,
                                        beta=0.02)
    assert losses[-1] < losses[0] / 5
    approx = p @ q.T
    observed = r > 0
    err = np.abs((approx - r))[observed].mean()
    assert err < 0.8, err
    recs = recommend(0, p, q, r[0] > 0, MOVIES, 2)
    assert len(recs) == 2
