"""Sharding tests on the 8-virtual-CPU-device mesh (SURVEY.md §4 (c), (d)):
golden test sharded lookup == unsharded gather; DP training step under a mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommender_system_tpu.parallel.embedding import (alltoall_lookup,
                                                       gspmd_lookup,
                                                       mod_shard_table,
                                                       sharded_lookup,
                                                       unshard_table)
from recommender_system_tpu.parallel.mesh import (make_mesh, param_shardings,
                                                  shard_batch, shard_state)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=4, model=2)


def test_mod_shard_roundtrip(rng):
    table = rng.normal(size=(103, 8)).astype(np.float32)
    sharded = mod_shard_table(table, 8)
    np.testing.assert_allclose(unshard_table(sharded, 103), table)


def test_alltoall_lookup_matches_gather(mesh, rng):
    V, d, B = 512, 16, 256
    table = rng.normal(size=(V, d)).astype(np.float32)
    ids = rng.integers(0, V, B).astype(np.int32)
    sharded = jnp.asarray(mod_shard_table(table, 8))
    out = sharded_lookup(sharded, jnp.asarray(ids), mesh, capacity_factor=8.0)
    np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)


def test_alltoall_lookup_gradient_is_scatter_add(mesh, rng):
    V, d, B = 128, 4, 64
    table = rng.normal(size=(V, d)).astype(np.float32)
    ids = rng.integers(0, V, B).astype(np.int32)
    sharded = jnp.asarray(mod_shard_table(table, 8))

    def loss(t):
        e = sharded_lookup(t, jnp.asarray(ids), mesh, capacity_factor=8.0)
        return jnp.sum(e * e)

    g = unshard_table(np.asarray(jax.grad(loss)(sharded)), V)
    expected = np.zeros_like(table)
    np.add.at(expected, ids, 2 * table[ids])
    np.testing.assert_allclose(g, expected, rtol=1e-4, atol=1e-5)


def test_alltoall_overflow_policy(mesh):
    """Ids past a destination's capacity resolve to zero vectors, not garbage."""
    V, d, B = 64, 4, 64
    table = np.random.default_rng(0).normal(size=(V, d)).astype(np.float32)
    ids = np.zeros(B, np.int32) + 8  # all ids hit shard 0 -> massive overflow
    sharded = jnp.asarray(mod_shard_table(table, 8))
    out = np.asarray(sharded_lookup(sharded, jnp.asarray(ids), mesh,
                                    capacity_factor=1.0))
    ok = np.isclose(out, table[ids]).all(1)
    zero = np.isclose(out, 0.0).all(1)
    assert np.all(ok | zero)
    assert ok.any()  # within-capacity ids still served


def test_gspmd_lookup_matches_gather(mesh, rng):
    V, d, B = 256, 8, 128
    table = rng.normal(size=(V, d)).astype(np.float32)
    ids = rng.integers(0, V, B).astype(np.int32)
    out = gspmd_lookup(jnp.asarray(table), jnp.asarray(ids), mesh)
    np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)


def test_trainer_with_mesh_matches_single_device(mesh):
    """DP + row-sharded tables trains and the batch really is split."""
    from recommender_system_tpu.models import DeepFM
    from recommender_system_tpu.training import Trainer
    from recommender_system_tpu.utils.datasets import (iter_batches,
                                                       synthetic_criteo)

    cols, X, y = synthetic_criteo(n_rows=256, vocab=64, embedding_dim=8)
    model = DeepFM(tuple(cols), hidden_units=(32, 16))
    tr = Trainer(model, mesh=mesh)
    state = tr.init(next(iter_batches(X, y, 64))[0])
    # the fused table is actually sharded across devices
    table = state.params["unified"]["embeddings"]["table_d9"]
    assert len(table.sharding.device_set) == 8
    state, hist = tr.fit(state, X, y, batch_size=64, epochs=2)
    assert hist["loss"][-1] < hist["loss"][0] + 1e-3

    # same seeds on a single device produce (nearly) the same losses
    tr1 = Trainer(model)
    state1 = tr1.init(next(iter_batches(X, y, 64))[0])
    state1, hist1 = tr1.fit(state1, X, y, batch_size=64, epochs=2)
    np.testing.assert_allclose(hist["loss"], hist1["loss"], rtol=2e-3,
                               atol=2e-3)


def test_mmoe_expert_parallel(mesh, rng):
    """MMOE experts shard over the 'model' axis (EP) and training works."""
    from recommender_system_tpu.models import MMOE
    from recommender_system_tpu.training import Trainer

    X = rng.random((256, 16)).astype(np.float32)
    y = np.stack([(X.sum(1) > 8).astype(np.float32),
                  (X[:, 0] > 0.5).astype(np.float32)], 1)
    model = MMOE(num_tasks=2, num_experts=4, expert_units=16,
                 tower_hidden_units=(8,))
    tr = Trainer(model, mesh=mesh)
    state = tr.init(X[:64])
    experts = state.params["mmoe"]["experts"]
    # expert axis (last) split over the 2-way 'model' axis
    assert experts.sharding.spec[-1] == "model"
    state, hist = tr.fit(state, X, y, batch_size=64, epochs=2)
    assert hist["loss"][-1] < hist["loss"][0] + 1e-3


def test_wide_table_column_sharding_rule(mesh, rng):
    """dim >= 64 stacks get the 2-D P('data','model') rule (rows x lanes);
    narrow stacks keep row-only sharding; gather matches unsharded."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from recommender_system_tpu.layers.embedding import packed_take
    from recommender_system_tpu.ops import dispatch

    wide = rng.normal(size=(64, 128)).astype(np.float32)   # dim 64, pack 2
    narrow = rng.normal(size=(64, 128)).astype(np.float32)  # dim 9
    params = {"unified": {"embeddings": {"table_d64": jnp.asarray(wide),
                                         "table_d9": jnp.asarray(narrow)}}}
    sh = param_shardings(params, mesh)
    tables = sh["unified"]["embeddings"]
    assert tables["table_d64"].spec == P("data", "model")
    assert tables["table_d9"].spec == P(("data", "model"), None)

    sharded = jax.device_put(jnp.asarray(wide), tables["table_d64"])
    rows = jnp.asarray(rng.integers(0, 128, 100).astype(np.int32))
    dispatch.set_mesh_mode(True)
    try:
        got = jax.jit(lambda s, r: packed_take(s, r, 64))(sharded, rows)
        want = packed_take(jnp.asarray(wide), rows, 64)
    finally:
        dispatch.set_mesh_mode(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    # gradient (scatter-add into the column-sharded stack) matches too
    def loss(s):
        return jnp.sum(packed_take(s, rows, 64) ** 2)

    dispatch.set_mesh_mode(True)
    try:
        g_sharded = jax.jit(jax.grad(loss))(sharded)
    finally:
        dispatch.set_mesh_mode(False)
    g_ref = jax.grad(loss)(jnp.asarray(wide))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_wide_table_fused_trainer_forces_row_sharding(mesh, rng):
    """Under Trainer(mesh, fused_embedding) / explicit_lookup, a dim>=64
    stack must FALL BACK to 1-D row sharding: the shard_map paths
    (parallel.fused) hard-assume P(axes, None), and a P('data','model')
    stack would be silently resharded every step (VERDICT r2 #7)."""
    import optax
    from jax.sharding import PartitionSpec as P

    from recommender_system_tpu.models import DIN
    from recommender_system_tpu.training import FusedAdagrad, Trainer
    from recommender_system_tpu.utils.features import (DenseFeat, SparseFeat,
                                                       VarLenSparseFeat)

    # DIN with d=64 -> EmbeddingCollection packs a [512, 128] table_d64
    # stack, which the GSPMD rule column-shards (128 lanes % 2 == 0)
    cols = (SparseFeat("user_id", 64, 64),
            SparseFeat("item_id", 64, 64, embedding_name="item_id"),
            VarLenSparseFeat(SparseFeat("hist_item_id", 64, 64,
                                        embedding_name="item_id"), maxlen=4),
            DenseFeat("price", 1))
    B = 64
    X = {"user_id": rng.integers(1, 64, B),
         "item_id": rng.integers(1, 64, B),
         "hist_item_id": rng.integers(0, 64, (B, 4)),
         "price": rng.normal(size=(B, 1)).astype(np.float32)}
    y = rng.integers(0, 2, B).astype(np.float32)

    def table_spec(state):
        stacks = [v for p, v in jax.tree_util.tree_leaves_with_path(
            state.params) if "table_d64" in jax.tree_util.keystr(p)]
        assert stacks, "expected a table_d64 stack"
        return stacks[0].sharding.spec

    model = DIN(cols, behavior_feature_list=("item_id",))
    # plain GSPMD trainer: wide stack gets the 2-D column sharding
    tr_plain = Trainer(model, mesh=mesh)
    assert table_spec(tr_plain.init(X)) == P("data", "model")

    # fused / explicit trainers: forced back to 1-D row sharding
    for kw in (dict(fused_embedding=FusedAdagrad(0.05)),
               dict(explicit_lookup=True)):
        tr = Trainer(model, optimizer=optax.adagrad(0.05), mesh=mesh,
                     capacity_factor=8.0, **kw)
        state = tr.init(X)
        assert table_spec(state) == P(("data", "model"), None), kw
        state, hist = tr.fit(state, X, y, batch_size=B, epochs=1,
                             shuffle=False)
        assert np.isfinite(hist["loss"][0])
