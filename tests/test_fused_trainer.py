"""End-to-end parity: Trainer(fused_embedding=...) == dense optax.adagrad."""
import numpy as np
import jax
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
    slots = fs.opt_state[1]
    acc = np.asarray(list(slots.values())[0][0])
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


def test_fused_din_sequence_model():
    """Fused optimizer with varlen [B,T] lookups (DIN) matches dense."""
    import jax
    from recommender_system_tpu.models import DIN
    from recommender_system_tpu.utils.features import (DenseFeat, SparseFeat,
                                                       VarLenSparseFeat)
    rng = np.random.default_rng(0)
    B, T, V = 256, 10, 40
    cols = (
        SparseFeat("user_id", V, 8),
        SparseFeat("item_id", V, 8, embedding_name="item_id"),
        VarLenSparseFeat(SparseFeat("hist_item_id", V, 8,
                                    embedding_name="item_id"), maxlen=T),
        DenseFeat("price", 1),
    )
    batch = {
        "user_id": jnp.asarray(rng.integers(1, V, size=B)),
        "item_id": jnp.asarray(rng.integers(1, V, size=B)),
        "hist_item_id": jnp.asarray(
            rng.integers(0, V, size=(B, T))),  # zeros = padding
        "price": jnp.asarray(rng.normal(size=(B, 1)).astype(np.float32)),
    }
    labels = jnp.asarray(rng.integers(0, 2, size=B).astype(np.float32))
    model = DIN(cols, behavior_feature_list=("item_id",))

    lr = 0.05
    dense_tr = Trainer(model, optimizer=optax.adagrad(lr), seed=1)
    fused_tr = Trainer(model, optimizer=optax.adagrad(lr), seed=1,
                       fused_embedding=FusedAdagrad(lr))
    ds, fs = dense_tr.init(batch), fused_tr.init(batch)
    d_step, f_step = dense_tr._make_train_step(), fused_tr._make_train_step()
    for _ in range(3):
        ds, dl = d_step(ds, batch, labels)
        fs, fl = f_step(fs, batch, labels)
    np.testing.assert_allclose(float(dl), float(fl), rtol=1e-3)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(ds.params),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(fs.params),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4,
                                   err_msg=str(pa))


def test_fused_multi_step_scan_matches_loop():
    """make_multi_step(scan) == the same steps issued one by one."""
    cols, batch, labels = _setup(n=256, vocab=40)
    model = DeepFM(tuple(cols), hidden_units=(16,))

    def mk():
        tr = Trainer(model, optimizer=optax.adagrad(0.05),
                     fused_embedding=FusedAdagrad(0.05), seed=7)
        return tr, tr.init(batch)

    tr1, s1 = mk()
    step = tr1._make_train_step()
    losses_loop = []
    for _ in range(4):
        s1, l = step(s1, batch, labels)
        losses_loop.append(float(l))

    tr2, s2 = mk()
    multi = tr2.make_multi_step()
    import jax
    batches = jax.tree.map(lambda x: jnp.stack([x] * 4), batch)
    labs = jnp.stack([labels] * 4)
    s2, losses = multi(s2, batches, labs)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_loop),
                               rtol=1e-4)
    a = s1.params["unified"]["embeddings"]["table_d9"]
    b = s2.params["unified"]["embeddings"]["table_d9"]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                               atol=1e-6)


def test_fused_sgd_matches_dense_optax():
    """FusedSGD == the same model trained with plain optax.sgd (stacks incl.)."""
    from recommender_system_tpu.training import FusedSGD

    cols, batch, labels = _setup(n=256)
    dense = Trainer(DeepFM(tuple(cols), hidden_units=(16,)),
                    optimizer=optax.sgd(0.05))
    ds = dense.init(batch)
    fused = Trainer(DeepFM(tuple(cols), hidden_units=(16,)),
                    optimizer=optax.sgd(0.05),
                    fused_embedding=FusedSGD(0.05))
    fs = fused.init(batch)
    d_step = dense._make_train_step()
    f_step = fused._make_train_step()
    for _ in range(5):
        ds, dl = d_step(ds, batch, labels)
        fs, fl = f_step(fs, batch, labels)
    np.testing.assert_allclose(float(fl), float(dl), rtol=5e-3)
    d_stack = np.asarray(ds.params["unified"]["embeddings"]["table_d9"])
    f_stack = np.asarray(fs.params["unified"]["embeddings"]["table_d9"])
    np.testing.assert_allclose(f_stack, d_stack, rtol=5e-3, atol=5e-5)


def test_fused_adam_matches_lazy_ref():
    """FusedAdam == the lazy-Adam XLA reference applied to the same update
    stream (kernel parity), and it learns (loss decreases)."""
    from recommender_system_tpu.ops.fused_adagrad import (fused_adam_apply,
                                                          fused_adam_ref)

    rng = np.random.default_rng(7)
    rows, n, pack, dim = 128, 300, 14, 9
    stack = jnp.asarray(rng.normal(size=(rows, 128)).astype(np.float32))
    m = jnp.zeros((rows, 128), jnp.float32)
    v = jnp.zeros((rows, 128), jnp.float32)
    lids = jnp.asarray(rng.integers(0, rows * pack, size=n, dtype=np.int32))
    ct = jnp.asarray(rng.normal(size=(n, dim)).astype(np.float32))
    ct_rounded = ct.astype(jnp.bfloat16).astype(jnp.float32)

    got = jax.jit(lambda s, mm, vv, i, c: fused_adam_apply(
        s, mm, vv, i, c, pack=pack, dim=dim, lr=1e-2, step=3,
        tile_rows=64, chunk=128))(stack, m, v, lids, ct)
    want = fused_adam_ref(stack, m, v, lids, ct_rounded, pack=pack, dim=dim,
                          lr=1e-2, step=3)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)

    # end-to-end: FusedAdam trains DeepFM (loss decreases)
    from recommender_system_tpu.training import FusedAdam

    cols, batch, labels = _setup(n=256)
    tr = Trainer(DeepFM(tuple(cols), hidden_units=(16,)),
                 optimizer=optax.adam(1e-2),
                 fused_embedding=FusedAdam(1e-2))
    st = tr.init(batch)
    step = tr._make_train_step()
    st, l0 = step(st, batch, labels)
    for _ in range(10):
        st, l1 = step(st, batch, labels)
    assert float(l1) < float(l0)


def test_fused_state_checkpoint_roundtrip(tmp_path):
    """The fused optimizer's slot state (accumulators) survives orbax
    checkpoint/resume byte-for-byte — restartability for the production
    training path (SURVEY.md §5.4)."""
    from recommender_system_tpu.training.checkpoint import (restore_checkpoint,
                                                            save_checkpoint)

    cols, batch, labels = _setup(n=256)
    tr = Trainer(DeepFM(tuple(cols), hidden_units=(16,)),
                 optimizer=optax.adagrad(0.05),
                 fused_embedding=FusedAdagrad(0.05))
    state = tr.init(batch)
    step = tr._make_train_step()
    for _ in range(3):
        state, _ = step(state, batch, labels)
    save_checkpoint(str(tmp_path / "ck"), state)

    fresh = tr.init(batch)
    restored = restore_checkpoint(str(tmp_path / "ck"), fresh)
    assert int(restored.step) == 3
    for (p, got), (_, want) in zip(
            sorted(restored.opt_state[1].items()),
            sorted(state.opt_state[1].items())):
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # training continues from the restored state
    restored, loss = step(restored, batch, labels)
    assert np.isfinite(float(loss)) and int(restored.step) == 4


def test_fused_adam_lazy_per_logical_row():
    """Laziness is per LOGICAL row: an untouched logical row sharing a
    lane-packed physical row with a touched one keeps its params and stale
    moments exactly (kernel and XLA ref agree — the round-1 per-physical-row
    mask would have decayed its momentum and nudged its params)."""
    from recommender_system_tpu.ops.fused_adagrad import (fused_adam_apply,
                                                          fused_adam_ref)

    rng = np.random.default_rng(3)
    rows, pack, dim = 64, 14, 9
    stack = jnp.asarray(rng.normal(size=(rows, 128)).astype(np.float32))
    # nonzero moments so an erroneous decay is visible
    m = jnp.asarray(rng.normal(size=(rows, 128)).astype(np.float32))
    v = jnp.abs(jnp.asarray(rng.normal(size=(rows, 128)).astype(np.float32)))
    # touch ONLY logical rows with slot 0 -> slots 1..13 share the physical
    # row but must stay untouched
    wide = rng.integers(0, rows, size=50, dtype=np.int32)
    lids = jnp.asarray(wide * pack)
    ct = jnp.asarray(rng.normal(size=(50, dim)).astype(np.float32))

    for fn in (
        lambda: fused_adam_ref(stack, m, v, lids, ct, pack=pack, dim=dim,
                               lr=1e-2, step=0),
        lambda: jax.jit(lambda s, mm, vv, i, c: fused_adam_apply(
            s, mm, vv, i, c, pack=pack, dim=dim, lr=1e-2, step=0,
            tile_rows=64, chunk=128))(stack, m, v, lids, ct),
    ):
        new_stack, new_m, new_v = fn()
        # lanes of slots 1..13 (dim..pack*dim) unchanged everywhere
        untouched = slice(dim, pack * dim)
        np.testing.assert_array_equal(np.asarray(new_stack)[:, untouched],
                                      np.asarray(stack)[:, untouched])
        np.testing.assert_array_equal(np.asarray(new_m)[:, untouched],
                                      np.asarray(m)[:, untouched])
        np.testing.assert_array_equal(np.asarray(new_v)[:, untouched],
                                      np.asarray(v)[:, untouched])
        # touched slot-0 lanes did move
        assert not np.allclose(np.asarray(new_stack)[wide, :dim],
                               np.asarray(stack)[wide, :dim])
