"""Work-queue scatter kernel (ops/embedding_grad): interpret-mode correctness
vs the XLA scatter reference, plus the packed_take_fast custom VJP.

Uses local generators (not the session-scoped ``rng`` fixture) so adding
tests here does not shift the shared stream consumed by later test files."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommender_system_tpu.ops.embedding_grad import (
    _packed_take_impl, packed_scatter_add, packed_take_fast,
    scatter_add_dense, scatter_add_dense_ref)


@pytest.mark.parametrize("N,rows,d", [
    (1000, 64, 8),      # many updates, few rows (heavy revisiting)
    (513, 1000, 128),   # full-lane rows, odd N
    (4096, 300, 9),     # unaligned dim
    (7, 2048, 16),      # nearly empty stream, many empty subtiles
    (1024, 1024, 1),    # scalar rows
])
def test_scatter_matches_xla(N, rows, d):
    rng = np.random.default_rng(N * 7 + rows)
    ids = jnp.asarray(rng.integers(0, rows, size=N, dtype=np.int32))
    g = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    out = scatter_add_dense(ids, g, rows, tile_rows=128, chunk=256)
    # kernel contracts at bf16: compare against the ref on bf16-rounded grads
    g_r = g.astype(jnp.bfloat16).astype(jnp.float32)
    ref = scatter_add_dense_ref(ids, g_r, rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_scatter_skewed_hot_row():
    rng = np.random.default_rng(1)
    """All updates hit one row — the work queue must chain chunks."""
    ids = jnp.full((5000,), 37, jnp.int32)
    g = jnp.asarray(rng.normal(size=(5000, 8)).astype(np.float32))
    out = scatter_add_dense(ids, g, 256, tile_rows=128, chunk=256)
    ref = scatter_add_dense_ref(
        ids, g.astype(jnp.bfloat16).astype(jnp.float32), 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("pack,dim", [(14, 9), (16, 8), (1, 128), (1, 100)])
def test_packed_take_fast_vjp(pack, dim):
    rng = np.random.default_rng(pack * 131 + dim)
    rows_wide, N = 512, 3000
    lanes = 128 if pack > 1 else dim
    stack = jnp.asarray(rng.normal(size=(rows_wide, lanes)).astype(np.float32))
    lids = jnp.asarray(
        rng.integers(0, rows_wide * pack, size=N, dtype=np.int32))
    ct = jnp.asarray(rng.normal(size=(N, dim)).astype(np.float32))

    out_fast = packed_take_fast(stack, lids, pack, dim)
    out_ref = _packed_take_impl(stack, lids, pack, dim)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)

    # the kernel contracts the cotangent stream at bf16 -> round both sides
    ct_r = ct.astype(jnp.bfloat16).astype(jnp.float32)
    g_fast = jax.vjp(lambda s: packed_take_fast(s, lids, pack, dim),
                     stack)[1](ct_r)[0]
    g_ref = jax.vjp(lambda s: _packed_take_impl(s, lids, pack, dim),
                    stack)[1](ct_r)[0]
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_fast_path_in_model_grads(monkeypatch):
    """DeepFM grads identical (interpret kernel) with fast scatter on/off."""
    monkeypatch.setenv("RST_FAST_SCATTER", "0")
    import optax
    from recommender_system_tpu.models import DeepFM
    from recommender_system_tpu.utils.datasets import synthetic_criteo

    cols, X, y = synthetic_criteo(n_rows=64, vocab=50, embedding_dim=8, seed=0)
    batch = {k: jnp.asarray(v) for k, v in X.items()}
    labels = jnp.asarray(y)
    model = DeepFM(tuple(cols), hidden_units=(16,))
    mv = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)

    def loss(v):
        logits = model.apply(v, batch, train=False)
        return optax.sigmoid_binary_cross_entropy(logits.ravel(),
                                                  labels).mean()

    g_off = jax.grad(loss)(mv)
    monkeypatch.setenv("RST_FAST_SCATTER", "1")
    g_on = jax.grad(loss)(mv)
    # stack grads differ by one bf16 rounding (kernel MXU contraction)
    for a, b in zip(jax.tree.leaves(g_off), jax.tree.leaves(g_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-3)

