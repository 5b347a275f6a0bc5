"""Mesh-sharded fused sparse optimizer + explicit all-to-all lookup
(parallel/fused.py): parity vs the single-device fused kernel and vs GSPMD,
plus overflow accounting. Runs on the 8-virtual-CPU-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.parallel.fused import (alltoall_take,
                                                   sharded_fused_update)
from recommender_system_tpu.parallel.mesh import make_mesh
from recommender_system_tpu.training import (FusedAdagrad, FusedAdam,
                                             FusedSGD, Trainer)
from recommender_system_tpu.utils.datasets import iter_batches, synthetic_criteo

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=4, model=2)


def _block_shard(mesh, arr):
    return jax.device_put(
        arr, NamedSharding(mesh, P(mesh.axis_names) + (None,) * (arr.ndim - 1)))


def test_alltoall_take_matches_gather(mesh, rng):
    R, L, N = 64, 16, 256
    stack = rng.normal(size=(R, L)).astype(np.float32)
    wids = rng.integers(0, R, N).astype(np.int32)
    out, overflow = alltoall_take(
        _block_shard(mesh, jnp.asarray(stack)), jnp.asarray(wids), mesh,
        capacity_factor=8.0)
    np.testing.assert_allclose(np.asarray(out), stack[wids], rtol=1e-6)
    assert int(overflow) == 0


def test_alltoall_take_gradient_is_scatter_add(mesh, rng):
    R, L, N = 32, 8, 64
    stack = rng.normal(size=(R, L)).astype(np.float32)
    wids = rng.integers(0, R, N).astype(np.int32)
    sharded = _block_shard(mesh, jnp.asarray(stack))

    def loss(s):
        e, _ = alltoall_take(s, jnp.asarray(wids), mesh, capacity_factor=8.0)
        return jnp.sum(e * e)

    g = np.asarray(loss and jax.grad(loss)(sharded))
    expected = np.zeros_like(stack)
    np.add.at(expected, wids, 2 * stack[wids])
    np.testing.assert_allclose(g, expected, rtol=1e-4, atol=1e-5)


def test_alltoall_take_overflow_zeros_and_counts(mesh, rng):
    """Over-capacity ids resolve to zero rows and are counted, not garbage."""
    R, L, N = 64, 8, 64
    stack = rng.normal(size=(R, L)).astype(np.float32) + 1.0
    wids = np.full(N, 3, np.int32)  # everything hits shard 0
    out, overflow = alltoall_take(
        _block_shard(mesh, jnp.asarray(stack)), jnp.asarray(wids), mesh,
        capacity_factor=1.0)
    out = np.asarray(out)
    served = np.isclose(out, stack[wids]).all(1)
    zeroed = np.isclose(out, 0.0).all(1)
    assert np.all(served | zeroed)
    assert served.any()
    assert int(overflow) == int(zeroed.sum()) > 0


@pytest.mark.parametrize("cfg", [FusedAdagrad(0.05), FusedSGD(0.05),
                                 FusedAdam(1e-2)],
                         ids=["adagrad", "sgd", "adam"])
@pytest.mark.parametrize("R, N, tol", [
    # production shape: 512-row stack -> 64 rows/shard, the Pallas kernel
    # runs on BOTH sides; tolerance = the kernel's bf16 cotangent rounding
    # (sums ordered differently across shard streams)
    (512, 1024, dict(rtol=2e-2, atol=2e-3)),
    # tiny per-shard stacks (rows % 64 != 0) take the exact f32 XLA-ref
    # fallback on the sharded side: compare against the f32 reference
    (64, 160, dict(rtol=1e-5, atol=1e-6)),
], ids=["pallas512", "xlaref64"])
def test_sharded_update_matches_single_device(mesh, rng, cfg, R, N, tol):
    """sharded_fused_update == the single-device update (no overflow)."""
    from recommender_system_tpu.ops.fused_adagrad import (
        fused_adagrad_ref, fused_adam_ref, fused_sgd_ref)

    dim = 9
    pack = 14  # pack_factor(9)
    stack = rng.normal(size=(R, 128)).astype(np.float32)
    slots = cfg.init_slots(jnp.asarray(stack))
    lids = rng.integers(0, R * pack, N).astype(np.int32)
    ct = rng.normal(size=(N, dim)).astype(np.float32)
    lr = float(cfg.learning_rate)

    if isinstance(cfg, FusedAdagrad):
        ref_stack, acc = fused_adagrad_ref(
            jnp.asarray(stack), slots[0], jnp.asarray(lids), jnp.asarray(ct),
            pack=pack, dim=dim, lr=lr, eps=cfg.eps)
        ref_slots = (acc,)
    elif isinstance(cfg, FusedSGD):
        (ref_stack,) = fused_sgd_ref(jnp.asarray(stack), jnp.asarray(lids),
                                     jnp.asarray(ct), pack=pack, dim=dim,
                                     lr=lr)
        ref_slots = ()
    else:
        ref_stack, m, v = fused_adam_ref(
            jnp.asarray(stack), slots[0], slots[1], jnp.asarray(lids),
            jnp.asarray(ct), pack=pack, dim=dim, lr=lr, step=jnp.int32(1),
            b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)
        ref_slots = (m, v)

    got_stack, got_slots, overflow = sharded_fused_update(
        cfg, _block_shard(mesh, jnp.asarray(stack)),
        jax.tree.map(lambda s: _block_shard(mesh, s), slots),
        jnp.asarray(lids), jnp.asarray(ct), mesh,
        lr=lr, step=jnp.int32(1), pack=pack, dim=dim,
        stream_dtype=jnp.float32, capacity_factor=8.0)

    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(got_stack), np.asarray(ref_stack),
                               **tol)
    for a, b in zip(jax.tree.leaves(got_slots), jax.tree.leaves(ref_slots)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)


def _setup(n=256, vocab=64):
    cols, X, y = synthetic_criteo(n_rows=n, vocab=vocab, embedding_dim=8,
                                  seed=0)
    batch = {k: jnp.asarray(v) for k, v in
             next(iter_batches(X, y, n))[0].items()}
    return cols, X, y, batch


@pytest.mark.parametrize("explicit_lookup", [False, True],
                         ids=["gspmd_lookup", "explicit_lookup"])
def test_trainer_mesh_fused_matches_single_device(mesh, explicit_lookup):
    """Trainer(mesh=..., fused_embedding=...) == the single-device fused
    path, with and without the explicit all-to-all forward gather."""
    cols, X, y, batch = _setup()
    labels = jnp.asarray(y[:256])
    lr = 0.05
    model = DeepFM(tuple(cols), hidden_units=(32, 16))

    single = Trainer(model, optimizer=optax.adagrad(lr), seed=3,
                     fused_embedding=FusedAdagrad(lr))
    sharded = Trainer(model, optimizer=optax.adagrad(lr), seed=3,
                      fused_embedding=FusedAdagrad(lr), mesh=mesh,
                      capacity_factor=8.0, explicit_lookup=explicit_lookup)

    ss, ms = single.init(batch), sharded.init(batch)
    table = ms.params["unified"]["embeddings"]["table_d9"]
    assert len(table.sharding.device_set) == 8
    s_step, m_step = single._make_train_step(), sharded._make_train_step()
    for i in range(3):
        ss, sl = s_step(ss, batch, labels)
        ms, out = m_step(ms, batch, labels)
        assert int(out["embedding_overflow"]) == 0
        np.testing.assert_allclose(float(out["loss"]), float(sl), rtol=2e-4,
                                   err_msg=f"loss diverged at step {i}")

    s_stack = np.asarray(ss.params["unified"]["embeddings"]["table_d9"])
    m_stack = np.asarray(ms.params["unified"]["embeddings"]["table_d9"])
    np.testing.assert_allclose(m_stack, s_stack, rtol=5e-3, atol=5e-5)
    # fused slot state stayed sharded and matches too
    s_acc = np.asarray(list(ss.opt_state[1].values())[0][0])
    m_acc_arr = list(ms.opt_state[1].values())[0][0]
    assert len(m_acc_arr.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(m_acc_arr), s_acc,
                               rtol=5e-3, atol=5e-5)


def test_trainer_mesh_fused_fit_and_overflow_history(mesh):
    """fit() under mesh+fused converges and surfaces the overflow counter;
    a starved capacity factor actually reports drops."""
    cols, X, y, batch = _setup()
    model = DeepFM(tuple(cols), hidden_units=(16,))
    tr = Trainer(model, optimizer=optax.adagrad(0.05),
                 fused_embedding=FusedAdagrad(0.05), mesh=mesh,
                 capacity_factor=8.0)
    state = tr.init(batch)
    state, hist = tr.fit(state, X, y, batch_size=64, epochs=2)
    assert hist["loss"][-1] < hist["loss"][0] + 1e-3
    assert hist["embedding_overflow"] == [0, 0]

    # capacity_factor well under 1: the exchange MUST drop and count
    tr2 = Trainer(model, optimizer=optax.adagrad(0.05),
                  fused_embedding=FusedAdagrad(0.05), mesh=mesh,
                  capacity_factor=0.05)
    st2 = tr2.init(batch)
    st2, hist2 = tr2.fit(st2, X, y, batch_size=64, epochs=1)
    assert hist2["embedding_overflow"][0] > 0


def _din_setup(rng, B=256, T=8, V=64):
    from recommender_system_tpu.utils.features import (DenseFeat, SparseFeat,
                                                       VarLenSparseFeat)

    cols = (
        SparseFeat("user_id", V, 8),
        SparseFeat("item_id", V, 8, embedding_name="item_id"),
        VarLenSparseFeat(SparseFeat("hist_item_id", V, 8,
                                    embedding_name="item_id"), maxlen=T),
        DenseFeat("price", 1),
    )
    X = {
        "user_id": jnp.asarray(rng.integers(1, V, size=B)),
        "item_id": jnp.asarray(rng.integers(1, V, size=B)),
        "hist_item_id": jnp.asarray(rng.integers(0, V, size=(B, T))),
        "price": jnp.asarray(rng.normal(size=(B, 1)).astype(np.float32)),
    }
    y = jnp.asarray(rng.integers(0, 2, size=B).astype(np.float32))
    return cols, X, y


def test_din_mesh_fused_explicit_matches_single_device(mesh, rng):
    """DIN under Trainer(mesh, fused_embedding, explicit_lookup): varlen
    history + shared item_id table -> MULTI-SITE cotangents ([B,T] hist +
    [B] item through one stack) through sharded_fused_update, vs the
    single-device fused trainer (VERDICT r2 #3)."""
    from recommender_system_tpu.models import DIN

    cols, X, y = _din_setup(rng)
    lr = 0.05
    model = DIN(cols, behavior_feature_list=("item_id",))

    single = Trainer(model, optimizer=optax.adagrad(lr), seed=3,
                     fused_embedding=FusedAdagrad(lr))
    sharded = Trainer(model, optimizer=optax.adagrad(lr), seed=3,
                      fused_embedding=FusedAdagrad(lr), mesh=mesh,
                      capacity_factor=8.0, explicit_lookup=True)
    ss, ms = single.init(X), sharded.init(X)
    s_step, m_step = single._make_train_step(), sharded._make_train_step()
    for i in range(3):
        ss, sl = s_step(ss, X, y)
        ms, out = m_step(ms, X, y)
        assert int(out["embedding_overflow"]) == 0
        np.testing.assert_allclose(float(out["loss"]), float(sl), rtol=2e-3,
                                   err_msg=f"loss diverged at step {i}")
    s_stack = np.asarray(ss.params["embeddings"]["table_d8"])
    m_stack = np.asarray(ms.params["embeddings"]["table_d8"])
    np.testing.assert_allclose(m_stack, s_stack, rtol=5e-3, atol=5e-4)


def test_dssm_mesh_explicit_matches_single_device(mesh, rng):
    """DSSM (two towers, shared item_id table, dense optax) under
    Trainer(mesh, explicit_lookup): the gradient of alltoall_take feeds the
    dense optimizer — parity vs the single-device trainer."""
    from recommender_system_tpu.models import DSSM
    from recommender_system_tpu.training.losses import inbatch_softmax_loss
    from recommender_system_tpu.utils.features import (SparseFeat,
                                                       VarLenSparseFeat)

    cols, X, y = _din_setup(rng)
    user_cols = (cols[0], cols[2])
    item_cols = (cols[1],)
    Xs = {k: X[k] for k in ("user_id", "hist_item_id", "item_id")}
    model = DSSM(user_cols, item_cols, user_hidden_units=(16, 8),
                 item_hidden_units=(16, 8))

    def loss_fn(outputs, labels, b):
        u, v = outputs
        return inbatch_softmax_loss(u, v, b["item_id"], temperature=0.05)

    single = Trainer(model, loss_fn=loss_fn, seed=3,
                     optimizer=optax.adagrad(0.05))
    sharded = Trainer(model, loss_fn=loss_fn, seed=3,
                      optimizer=optax.adagrad(0.05), mesh=mesh,
                      capacity_factor=8.0, explicit_lookup=True)
    ss, ms = single.init(Xs), sharded.init(Xs)
    s_step, m_step = single._make_train_step(), sharded._make_train_step()
    for i in range(3):
        ss, sl = s_step(ss, Xs, y)
        ms, ml = m_step(ms, Xs, y)
        np.testing.assert_allclose(float(ml), float(sl), rtol=2e-3,
                                   err_msg=f"loss diverged at step {i}")
    for key in ss.params["embeddings"]:
        np.testing.assert_allclose(
            np.asarray(ms.params["embeddings"][key]),
            np.asarray(ss.params["embeddings"][key]), rtol=5e-3, atol=5e-4)


def _dien_setup(rng, B=128, T=8, V=64):
    """DIN setup + neg-history varlen column (3 lookup sites through the
    shared item_id table: query [B], hist [B,T], neg hist [B,T])."""
    from recommender_system_tpu.utils.features import (SparseFeat,
                                                       VarLenSparseFeat)

    cols, X, y = _din_setup(rng, B=B, T=T, V=V)
    cols = cols + (VarLenSparseFeat(
        SparseFeat("neg_hist_item_id", V, 8, embedding_name="item_id"),
        maxlen=T),)
    X = dict(X)
    hist = np.asarray(X["hist_item_id"])
    neg = rng.integers(1, V, size=hist.shape).astype(np.int32)
    X["neg_hist_item_id"] = jnp.asarray(np.where(hist > 0, neg, 0))
    return cols, X, y


def test_dien_mesh_fused_explicit_matches_single_device(mesh, rng):
    """DIEN under Trainer(mesh, fused_embedding, explicit_lookup): the
    deepest model in the zoo — 3 lookup sites through one shared table,
    GRU+AUGRU, aux loss on neg histories — must track the single-device
    fused trainer step for step (VERDICT r4 #3)."""
    from recommender_system_tpu.models import DIEN

    cols, X, y = _dien_setup(rng)
    lr = 0.05
    model = DIEN(cols, behavior_feature_list=("item_id",),
                 use_negsampling=True, hidden_units=(16, 8))

    single = Trainer(model, optimizer=optax.adagrad(lr), seed=3,
                     fused_embedding=FusedAdagrad(lr))
    sharded = Trainer(model, optimizer=optax.adagrad(lr), seed=3,
                      fused_embedding=FusedAdagrad(lr), mesh=mesh,
                      capacity_factor=8.0, explicit_lookup=True)
    ss, ms = single.init(X), sharded.init(X)
    s_step, m_step = single._make_train_step(), sharded._make_train_step()
    for i in range(3):
        ss, sl = s_step(ss, X, y)
        ms, out = m_step(ms, X, y)
        assert int(out["embedding_overflow"]) == 0
        np.testing.assert_allclose(float(out["loss"]), float(sl), rtol=2e-3,
                                   err_msg=f"loss diverged at step {i}")
    s_stack = np.asarray(ss.params["embeddings"]["table_d8"])
    m_stack = np.asarray(ms.params["embeddings"]["table_d8"])
    np.testing.assert_allclose(m_stack, s_stack, rtol=5e-3, atol=5e-4)


def test_sharded_update_split_stream_matches_ref(mesh, rng, monkeypatch):
    """Per-shard streams over the gather cliff get position-chunked inside
    _update_body (VERDICT r4 #3): force a tiny split threshold and check
    exact parity vs the single-device f32 reference."""
    from recommender_system_tpu.ops.fused_adagrad import fused_adagrad_ref

    monkeypatch.setenv("RST_STREAM_SPLIT_ROWS", "64")
    cfg = FusedAdagrad(0.05)
    R, N, dim, pack = 64, 1024, 9, 14
    stack = rng.normal(size=(R, 128)).astype(np.float32)
    slots = cfg.init_slots(jnp.asarray(stack))
    lids = rng.integers(0, R * pack, N).astype(np.int32)
    ct = rng.normal(size=(N, dim)).astype(np.float32)

    ref_stack, acc = fused_adagrad_ref(
        jnp.asarray(stack), slots[0], jnp.asarray(lids), jnp.asarray(ct),
        pack=pack, dim=dim, lr=0.05, eps=cfg.eps)
    got_stack, got_slots, overflow = sharded_fused_update(
        cfg, _block_shard(mesh, jnp.asarray(stack)),
        jax.tree.map(lambda s: _block_shard(mesh, s), slots),
        jnp.asarray(lids), jnp.asarray(ct), mesh,
        lr=0.05, step=jnp.int32(1), pack=pack, dim=dim,
        stream_dtype=jnp.float32, capacity_factor=8.0)
    assert int(overflow) == 0
    # per-shard recv stream is 8*ceil(8*128/8)=1024 rows >> 64: the split
    # path ran; R=64 -> 8 rows/shard takes the exact f32 XLA-ref fallback
    np.testing.assert_allclose(np.asarray(got_stack), np.asarray(ref_stack),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_slots[0]), np.asarray(acc),
                               rtol=1e-5, atol=1e-6)
