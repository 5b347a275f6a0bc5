"""Serving tests: Scorer padding/compile-once, RetrievalIndex top-k."""
import numpy as np
import pytest

from recommender_system_tpu.models import DSSM, DeepFM
from recommender_system_tpu.serving import RetrievalIndex, Scorer
from recommender_system_tpu.training import Trainer
from recommender_system_tpu.training.losses import inbatch_softmax_loss
from recommender_system_tpu.utils.datasets import iter_batches, synthetic_criteo
from recommender_system_tpu.utils.features import SparseFeat, VarLenSparseFeat


def test_scorer_matches_predict_any_length():
    cols, X, y = synthetic_criteo(n_rows=300, vocab=50)
    tr = Trainer(DeepFM(tuple(cols), hidden_units=(16, 8)))
    state = tr.init(next(iter_batches(X, y, 64))[0])
    state, _ = tr.fit(state, X, y, batch_size=64, epochs=1)
    scorer = Scorer(tr.model, state, batch_size=128)
    for n in [1, 100, 300]:
        Xn = {k: v[:n] for k, v in X.items()}
        got = scorer(Xn)
        want = tr.predict(state, Xn, batch_size=128)
        assert got.shape[0] == n
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_retrieval_index_topk(rng):
    n_users, n_items, T = 40, 60, 4
    user_cols = (SparseFeat("user_id", n_users, 8),
                 VarLenSparseFeat(SparseFeat("hist_item_id", n_items, 8,
                                             embedding_name="item_id"),
                                  maxlen=T))
    item_cols = (SparseFeat("item_id", n_items, 8),)
    model = DSSM(user_cols, item_cols, user_hidden_units=(16, 8),
                 item_hidden_units=(16, 8))
    X = {"user_id": rng.integers(1, n_users, 128).astype(np.int32),
         "item_id": rng.integers(1, n_items, 128).astype(np.int32),
         "hist_item_id": rng.integers(1, n_items, (128, T)).astype(np.int32)}
    y = np.ones(128, np.float32)

    def loss_fn(outputs, labels, batch):
        u, v = outputs
        return inbatch_softmax_loss(u, v, batch["item_id"], temperature=0.05)

    tr = Trainer(model, loss_fn=loss_fn)
    state = tr.init(next(iter_batches(X, y, 64))[0])
    state, _ = tr.fit(state, X, y, batch_size=64, epochs=1)

    catalog = {"item_id": np.arange(1, n_items, dtype=np.int32)}
    index = RetrievalIndex(model, state, catalog)
    ids, scores = index.query({k: v[:16] for k, v in X.items()}, k=5)
    assert ids.shape == (16, 5) and scores.shape == (16, 5)
    # scores sorted descending, ids from the catalog
    assert np.all(np.diff(scores, axis=1) <= 1e-6)
    assert np.isin(ids, catalog["item_id"]).all()

    # brute-force check for row 0
    u = model.apply({"params": state.params},
                    {k: v[:1] for k, v in X.items()},
                    method=model.user_embedding)
    all_items = model.apply({"params": state.params}, catalog,
                            method=model.item_embedding)
    full = np.asarray(u) @ np.asarray(all_items).T
    expected = catalog["item_id"][np.argsort(-full[0])[:5]]
    np.testing.assert_array_equal(ids[0], expected)


def test_streaming_evaluate_close_to_exact():
    cols, X, y = synthetic_criteo(n_rows=600, vocab=50, seed=3)
    tr = Trainer(DeepFM(tuple(cols), hidden_units=(16, 8)))
    state = tr.init(next(iter_batches(X, y, 64))[0])
    state, _ = tr.fit(state, X, y, batch_size=64, epochs=2)
    exact = tr.evaluate(state, X, y)
    stream = tr.evaluate(state, X, y, streaming=True)
    assert abs(exact["auc"] - stream["auc"]) < 1e-2
    np.testing.assert_allclose(exact["logloss"], stream["logloss"], rtol=1e-4)
    np.testing.assert_allclose(exact["accuracy"], stream["accuracy"], rtol=1e-6)
