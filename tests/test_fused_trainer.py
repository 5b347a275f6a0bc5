"""End-to-end parity: Trainer(fused_embedding=...) == dense optax.adagrad."""
import numpy as np
import jax.numpy as jnp
import optax

from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.training import FusedAdagrad, Trainer
from recommender_system_tpu.utils.datasets import synthetic_criteo


def _setup(n=512, vocab=50):
    cols, X, y = synthetic_criteo(n_rows=n, vocab=vocab, embedding_dim=8,
                                  seed=0)
    batch = {k: jnp.asarray(v) for k, v in X.items()}
    labels = jnp.asarray(y)
    return cols, batch, labels


def test_fused_matches_dense_adagrad():
    cols, batch, labels = _setup()
    lr = 0.05

    model = DeepFM(tuple(cols), hidden_units=(32, 16))
    dense_tr = Trainer(model, optimizer=optax.adagrad(lr), seed=3)
    fused_tr = Trainer(model, optimizer=optax.adagrad(lr), seed=3,
                       fused_embedding=FusedAdagrad(learning_rate=lr))

    ds = dense_tr.init(batch)
    fs = fused_tr.init(batch)
    d_step = dense_tr._make_train_step()
    f_step = fused_tr._make_train_step()

    for i in range(3):
        ds, dl = d_step(ds, batch, labels)
        fs, fl = f_step(fs, batch, labels)
        np.testing.assert_allclose(float(dl), float(fl), rtol=2e-4,
                                   err_msg=f"loss diverged at step {i}")

    d_stack = np.asarray(
        ds.params["unified"]["embeddings"]["table_d9"])
    f_stack = np.asarray(
        fs.params["unified"]["embeddings"]["table_d9"])
    np.testing.assert_allclose(f_stack, d_stack, rtol=5e-3, atol=5e-5)

    # dense-side params must match too (same optax path)
    d_k = np.asarray(ds.params["deep"]["dense_0"]["kernel"])
    f_k = np.asarray(fs.params["deep"]["dense_0"]["kernel"])
    np.testing.assert_allclose(f_k, d_k, rtol=5e-3, atol=5e-5)

    # accumulator sanity: touched rows moved off the initial value
    accs = fs.opt_state[1]
    acc = np.asarray(list(accs.values())[0])
    assert (acc > 0.1 + 1e-6).any()


def test_fused_eval_and_predict_paths():
    cols, batch, labels = _setup(n=256)
    model = DeepFM(tuple(cols), hidden_units=(16,))
    tr = Trainer(model, optimizer=optax.adagrad(0.05),
                 fused_embedding=FusedAdagrad(0.05))
    state = tr.init(batch)
    step = tr._make_train_step()
    state, loss0 = step(state, batch, labels)
    for _ in range(5):
        state, loss = step(state, batch, labels)
    assert float(loss) < float(loss0)
    X = {k: np.asarray(v) for k, v in batch.items()}
    preds = tr.predict(state, X, batch_size=128)
    assert preds.shape[0] == 256
    assert np.isfinite(preds).all()
