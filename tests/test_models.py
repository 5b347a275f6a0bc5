"""Model-zoo tests: every model trains on learnable synthetic data and its loss
decreases; the signal-bearing models reach AUC thresholds (SURVEY.md §4 (b))."""
import numpy as np
import pytest

import jax

from recommender_system_tpu import models as M
from recommender_system_tpu.training import Trainer, default_loss
from recommender_system_tpu.training.losses import inbatch_softmax_loss
from recommender_system_tpu.utils.datasets import (iter_batches,
                                                   synthetic_behavior,
                                                   synthetic_criteo)


@pytest.fixture(scope="module")
def criteo():
    return synthetic_criteo(n_rows=1024, vocab=60, embedding_dim=8, seed=1)


@pytest.fixture(scope="module")
def behavior():
    return synthetic_behavior(n_rows=1024, n_items=120, seq_len=8, seed=1)


def _fit(model, X, y, epochs=3, batch_size=128, **kw):
    tr = Trainer(model, **kw)
    state = tr.init(next(iter_batches(X, y, batch_size))[0])
    state, hist = tr.fit(state, X, y, batch_size=batch_size, epochs=epochs)
    return tr, state, hist


CRITEO_MODELS = {
    "fm": lambda c: M.FM(tuple(c)),
    "ffm": lambda c: M.FFM(tuple(c), factor_dim=2),
    "fnn": lambda c: M.FNN(tuple(c), hidden_units=(64, 32)),
    "wide_deep": lambda c: M.WideDeep(tuple(c), hidden_units=(64, 32)),
    "deepfm": lambda c: M.DeepFM(tuple(c), hidden_units=(64, 32)),
    "dcn": lambda c: M.DCN(tuple(c), cross_layers=3, hidden_units=(64, 32)),
    "deep_crossing": lambda c: M.DeepCrossing(tuple(c), hidden_units=(64,),
                                              num_res_blocks=2),
    "pnn": lambda c: M.PNN(tuple(c), mode="inner", hidden_units=(64, 32)),
    "nfm": lambda c: M.NFM(tuple(c), hidden_units=(64, 32)),
    "afm": lambda c: M.AFM(tuple(c)),
}


@pytest.mark.parametrize("name", sorted(CRITEO_MODELS))
def test_criteo_model_learns(criteo, name):
    cols, X, y = criteo
    epochs = 4 if name == "nfm" else 2  # BN warmup needs a few more steps
    tr, state, hist = _fit(CRITEO_MODELS[name](cols), X, y, epochs=epochs)
    assert hist["loss"][-1] < hist["loss"][0] + 1e-3, hist["loss"]
    metrics = tr.evaluate(state, X, y)
    assert metrics["auc"] > 0.62, (name, metrics)


def test_pnn_outer_and_fgcnn(criteo):
    cols, X, y = criteo
    model = M.PNN(tuple(cols), mode="both", use_fgcnn=True,
                  hidden_units=(32, 16))
    tr, state, hist = _fit(model, X, y, epochs=1)
    assert np.isfinite(hist["loss"][0])


def test_din_learns_attention_signal(behavior):
    cols, X, y = behavior
    tr, state, hist = _fit(
        M.DIN(tuple(cols), hidden_units=(64, 32), activation="dice"),
        X, y, epochs=5)
    metrics = tr.evaluate(state, X, y)
    assert metrics["auc"] > 0.75, metrics


def test_dien_trains_with_aux_loss(behavior):
    cols, X, y = behavior
    rng = np.random.default_rng(0)
    X = dict(X)
    X["neg_hist_item_id"] = np.where(
        X["hist_item_id"] > 0,
        rng.integers(1, 120, X["hist_item_id"].shape), 0).astype(np.int32)
    from recommender_system_tpu.utils.features import (SparseFeat,
                                                       VarLenSparseFeat)
    cols = list(cols) + [VarLenSparseFeat(
        SparseFeat("neg_hist_item_id", 120, 8, embedding_name="item_id"),
        maxlen=8)]
    model = M.DIEN(tuple(cols), hidden_units=(64, 32), use_negsampling=True)
    tr, state, hist = _fit(model, X, y, epochs=3)
    metrics = tr.evaluate(state, X, y)
    assert metrics["auc"] > 0.7, metrics

    # aux loss is actually nonzero
    batch = next(iter_batches(X, y, 64))[0]
    variables = {"params": state.params}
    if len(state.batch_stats):
        variables["batch_stats"] = state.batch_stats
    _, aux = model.apply(variables, batch, train=False)
    assert float(aux) > 0.0


def test_fnn_two_stage_from_fm(criteo):
    from recommender_system_tpu.layers.embedding import unpack_stack

    cols, X, y = criteo
    fm_tr, fm_state, _ = _fit(M.FM(tuple(cols)), X, y, epochs=1)
    fnn = M.FNN(tuple(cols), hidden_units=(32, 16))
    tr = Trainer(fnn)
    state = tr.init(next(iter_batches(X, y, 128))[0])
    new_vars = M.init_from_fm({"params": state.params},
                              {"params": fm_state.params}, cols)
    # FM's trained factor vectors (sans linear lane) were copied in
    total = 26 * 60  # 26 features x vocab 60
    got = np.asarray(unpack_stack(new_vars["params"]["embeddings"]["table_d8"],
                                  total, 8))
    want = np.asarray(unpack_stack(
        fm_state.params["unified"]["embeddings"]["table_d9"], total, 9))[:, :8]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_mmoe_multitask():
    # local generator: result must not depend on the session rng position
    rng = np.random.default_rng(7)
    X = rng.random((512, 16)).astype(np.float32)
    y = np.stack([(X.sum(1) > 8).astype(np.float32),
                  (X[:, 0] > 0.5).astype(np.float32)], 1)
    model = M.MMOE(num_tasks=2, num_experts=4, expert_units=16,
                   tower_hidden_units=(8,))
    tr, state, hist = _fit(model, X, y, epochs=5)
    metrics = tr.evaluate(state, X, y)
    assert metrics["task0_auc"] > 0.8 and metrics["task1_auc"] > 0.8, metrics


def test_dssm_inbatch_softmax_learns(rng):
    from recommender_system_tpu.utils.features import (SparseFeat,
                                                       VarLenSparseFeat)
    n_users, n_items, T = 64, 80, 6
    # users prefer items of their own "category" (u % 4 == i % 4)
    users = rng.integers(1, n_users, 2048).astype(np.int32)
    items = np.where(rng.uniform(size=2048) < 0.8,
                     (users % 4) + 4 * rng.integers(1, n_items // 4, 2048),
                     rng.integers(1, n_items, 2048)).astype(np.int32) % n_items
    items = np.maximum(items, 1)
    hist = rng.integers(1, n_items, (2048, T)).astype(np.int32)
    X = {"user_id": users, "item_id": items, "hist_item_id": hist}
    user_cols = (SparseFeat("user_id", n_users, 8),
                 VarLenSparseFeat(SparseFeat("hist_item_id", n_items, 8,
                                             embedding_name="item_id"),
                                  maxlen=T))
    item_cols = (SparseFeat("item_id", n_items, 8),)
    model = M.DSSM(user_cols, item_cols, user_hidden_units=(32, 16),
                   item_hidden_units=(32, 16))

    def loss_fn(outputs, labels, batch):
        u, v = outputs
        # temperature sharpens the L2-normalized logits (model/dssm.py:59-70)
        return inbatch_softmax_loss(u, v, batch["item_id"], temperature=0.05)

    tr = Trainer(model, loss_fn=loss_fn)
    y = np.ones(len(users), np.float32)
    state = tr.init(next(iter_batches(X, y, 256))[0])
    state, hist_ = tr.fit(state, X, y, batch_size=256, epochs=4)
    assert hist_["loss"][-1] < hist_["loss"][0] - 0.1, hist_["loss"]

    # tower export: embeddings are L2-normalized
    batch = next(iter_batches(X, y, 256))[0]
    u = model.apply({"params": state.params}, batch,
                    method=model.user_embedding)
    norms = np.linalg.norm(np.asarray(u), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_lstm_classifier(rng):
    # label = whether token "7" appears
    Xtok = rng.integers(1, 50, (512, 12)).astype(np.int32)
    y = (Xtok == 7).any(1).astype(np.float32)
    tr, state, hist = _fit(M.LSTMClassifier(vocab_size=50, embed_dim=16,
                                            hidden=16), Xtok, y, epochs=6)
    metrics = tr.evaluate(state, Xtok, y)
    assert metrics["auc"] > 0.8, metrics


def test_transformer_classifier(rng):
    Xtok = rng.integers(1, 50, (512, 12)).astype(np.int32)
    y = (Xtok == 7).any(1).astype(np.float32)
    model = M.TransformerClassifier(vocab_size=50, model_dim=32, num_heads=4,
                                    num_layers=1, ffn_dim=64, max_len=12)
    tr, state, hist = _fit(model, Xtok, y, epochs=4)
    metrics = tr.evaluate(state, Xtok, y)
    assert metrics["auc"] > 0.8, metrics


def test_transformer_seq2seq_shapes(rng):
    model = M.Transformer(vocab_size=30, model_dim=16, num_heads=2,
                          num_layers=1, ffn_dim=32, max_len=10)
    src = rng.integers(1, 30, (2, 10)).astype(np.int32)
    tgt = rng.integers(1, 30, (2, 9)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), src, tgt)
    out = model.apply(variables, src, tgt)
    assert out.shape == (2, 9, 30)
