"""Fused sparse Adagrad kernel == dense optax.adagrad on the scattered grad."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from recommender_system_tpu.ops.fused_adagrad import (fused_adagrad_apply,
                                                      fused_adagrad_ref)


@pytest.mark.parametrize("pack,dim,rows,n", [
    (14, 9, 128, 513),     # lane-packed, odd stream length
    (16, 8, 192, 64),      # pack*dim == 128 exactly
    (1, 128, 64, 300),     # unpacked full-lane rows
])
def test_matches_dense_optax(pack, dim, rows, n):
    rng = np.random.default_rng(0)
    L = 128
    stack = jnp.asarray(rng.normal(size=(rows, L)).astype(np.float32))
    acc = jnp.full((rows, L), 0.1, jnp.float32)
    max_lid = rows * pack
    lids = jnp.asarray(rng.integers(0, max_lid, size=n, dtype=np.int32))
    ct = jnp.asarray(rng.normal(size=(n, dim)).astype(np.float32))
    lr, eps = 0.05, 1e-7

    new_stack, new_acc = jax.jit(
        lambda s, a, i, c: fused_adagrad_apply(
            s, a, i, c, pack=pack, dim=dim, lr=lr, eps=eps,
            tile_rows=64, chunk=128))(stack, acc, lids, ct)

    # the kernel contracts grads at bf16: pre-round the ref's cotangents the
    # same way, then both sides sum identical values in f32 -> tight tolerance
    ct_rounded = ct.astype(jnp.bfloat16).astype(jnp.float32)
    ref_stack, ref_acc = fused_adagrad_ref(
        stack, acc, lids, ct_rounded, pack=pack, dim=dim, lr=lr, eps=eps)

    # and against real optax on the dense scatter-added gradient
    from recommender_system_tpu.ops.embedding_grad import _lane_shift
    if pack == 1:
        g = jnp.zeros((rows, L)).at[lids].add(
            jnp.pad(ct_rounded, ((0, 0), (0, L - dim))))
    else:
        g = jnp.zeros((rows, L)).at[lids // pack].add(
            _lane_shift(ct_rounded, lids % pack, pack, dim))
    tx = optax.adagrad(lr, initial_accumulator_value=0.1, eps=eps)
    opt_state = tx.init(stack)
    updates, _ = tx.update(g, opt_state, stack)
    optax_stack = optax.apply_updates(stack, updates)

    np.testing.assert_allclose(np.asarray(new_acc), np.asarray(ref_acc),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_stack), np.asarray(ref_stack),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref_stack), np.asarray(optax_stack),
                               rtol=1e-5, atol=1e-6)


def test_untouched_rows_unchanged():
    """Empty subtiles are never visited — aliased data must survive."""
    rng = np.random.default_rng(1)
    rows, pack, dim = 256, 14, 9
    stack = jnp.asarray(rng.normal(size=(rows, 128)).astype(np.float32))
    acc = jnp.full((rows, 128), 0.1, jnp.float32)
    # all updates hit rows < 64 (subtile 0 of 4 with tile_rows=64)
    lids = jnp.asarray(rng.integers(0, 64 * pack, size=100, dtype=np.int32))
    ct = jnp.asarray(rng.normal(size=(100, dim)).astype(np.float32))
    new_stack, new_acc = jax.jit(
        lambda s, a, i, c: fused_adagrad_apply(
            s, a, i, c, pack=pack, dim=dim, lr=0.1, tile_rows=64,
            chunk=128))(stack, acc, lids, ct)
    np.testing.assert_array_equal(np.asarray(new_stack[64:]),
                                  np.asarray(stack[64:]))
    np.testing.assert_array_equal(np.asarray(new_acc[64:]),
                                  np.asarray(acc[64:]))
    assert not np.allclose(np.asarray(new_stack[:64]), np.asarray(stack[:64]))


def test_duplicate_ids_presummed():
    """Duplicates must sum BEFORE squaring (dense-grad semantics)."""
    stack = jnp.zeros((64, 128), jnp.float32)
    acc = jnp.zeros((64, 128), jnp.float32)
    lids = jnp.asarray([3, 3, 3], jnp.int32)  # pack=1
    ct = jnp.ones((3, 128), jnp.float32)
    new_stack, new_acc = jax.jit(
        lambda s, a, i, c: fused_adagrad_apply(
            s, a, i, c, pack=1, dim=128, lr=1.0, tile_rows=64,
            chunk=128))(stack, acc, lids, ct)
    # g=3 summed -> acc=9, update = -1 * 3/sqrt(9+eps) ~= -1
    np.testing.assert_allclose(np.asarray(new_acc[3]), 9.0, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(new_stack[3]), -1.0, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(new_stack[4]), 0.0)


@pytest.mark.parametrize("pack,dim", [(14, 9), (4, 32), (1, 128)])
def test_reorder_modes_identical(pack, dim):
    """The cotangent-reorder order (fused_adagrad_apply(reorder=...)) is a
    pure layout/scheduling choice — the permutation commutes with the lane
    shift, so all modes must agree bit-for-bit, and match the dense
    reference on bf16-pre-rounded cotangents."""
    rng = np.random.default_rng(42)
    rows, n, L = 128, 257, 128
    stack = jnp.asarray(rng.normal(size=(rows, L)).astype(np.float32))
    acc = jnp.full((rows, L), 0.1, jnp.float32)
    lids = jnp.asarray(rng.integers(0, rows * pack, size=n, dtype=np.int32))
    ct = jnp.asarray(rng.normal(size=(n, dim)).astype(np.float32))

    outs = {}
    for reorder in ("take_first", "shift_first", "auto"):
        outs[reorder] = jax.jit(
            lambda s, a, i, c, r=reorder: fused_adagrad_apply(
                s, a, i, c, pack=pack, dim=dim, lr=0.05, eps=1e-7,
                tile_rows=64, chunk=128, reorder=r))(stack, acc, lids, ct)
    for mode in ("shift_first", "auto"):
        np.testing.assert_array_equal(np.asarray(outs["take_first"][0]),
                                      np.asarray(outs[mode][0]))
        np.testing.assert_array_equal(np.asarray(outs["take_first"][1]),
                                      np.asarray(outs[mode][1]))

    ct_rounded = ct.astype(jnp.bfloat16).astype(jnp.float32)
    ref_stack, ref_acc = fused_adagrad_ref(
        stack, acc, lids, ct_rounded, pack=pack, dim=dim, lr=0.05, eps=1e-7)
    np.testing.assert_allclose(np.asarray(outs["auto"][0]),
                               np.asarray(ref_stack), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs["auto"][1]),
                               np.asarray(ref_acc), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pack,dim", [(16, 8), (4, 32), (1, 128)])
def test_multi_stream_sites_match_concat(pack, dim):
    """Per-site sorted streams (the DIEN reorder-cliff fix) must be exactly
    the single concatenated-stream semantics: all of a subtile's chunks
    accumulate before its apply, so duplicates across sites pre-sum."""
    rng = np.random.default_rng(1)
    rows, L = 192, 128
    stack = jnp.asarray(rng.normal(size=(rows, L)).astype(np.float32))
    acc = jnp.full((rows, L), 0.1, jnp.float32)
    max_lid = rows * pack
    # three sites of very different sizes, with heavy cross-site duplicates
    ns = (700, 450, 37)
    site_ids = [jnp.asarray(rng.integers(0, max_lid, size=n, dtype=np.int32))
                for n in ns]
    site_ct = [jnp.asarray(rng.normal(size=(n, dim)).astype(np.float32))
               for n in ns]
    lids = jnp.concatenate(site_ids)
    ct = jnp.concatenate(site_ct)
    kw = dict(pack=pack, dim=dim, lr=0.05, tile_rows=64, chunk=128)

    multi_stack, multi_acc = jax.jit(
        lambda s, a, i, c, sites: fused_adagrad_apply(
            s, a, i, c, sites=sites, **kw))(
        stack, acc, lids, ct,
        [(i, c, None) for i, c in zip(site_ids, site_ct)])
    single_stack, single_acc = jax.jit(
        lambda s, a, i, c: fused_adagrad_apply(s, a, i, c, **kw))(
        stack, acc, lids, ct)
    np.testing.assert_allclose(np.asarray(multi_stack),
                               np.asarray(single_stack), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(multi_acc),
                               np.asarray(single_acc), rtol=1e-4, atol=1e-5)


def test_split_oversize_sites_preserves_semantics():
    """An oversize site split into position-chunks gives the same update;
    split parts re-sort (presorted info is dropped)."""
    from recommender_system_tpu.ops.fused_adagrad import split_oversize_sites

    rng = np.random.default_rng(2)
    rows, L, pack, dim = 128, 128, 16, 8
    stack = jnp.asarray(rng.normal(size=(rows, L)).astype(np.float32))
    acc = jnp.full((rows, L), 0.1, jnp.float32)
    n = 1000
    lids = jnp.asarray(rng.integers(0, rows * pack, size=n, dtype=np.int32))
    ct = jnp.asarray(rng.normal(size=(n, dim)).astype(np.float32))
    parts = split_oversize_sites([(lids, ct, None)], max_rows=300)
    assert len(parts) == 4 and all(p[2] is None for p in parts)
    assert sum(p[0].shape[0] for p in parts) == n
    kw = dict(pack=pack, dim=dim, lr=0.05, tile_rows=64, chunk=128)
    split_stack, split_acc = jax.jit(
        lambda s, a, i, c, sites: fused_adagrad_apply(
            s, a, i, c, sites=sites, **kw))(stack, acc, lids, ct, parts)
    single_stack, single_acc = jax.jit(
        lambda s, a, i, c: fused_adagrad_apply(s, a, i, c, **kw))(
        stack, acc, lids, ct)
    np.testing.assert_allclose(np.asarray(split_stack),
                               np.asarray(single_stack), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(split_acc),
                               np.asarray(single_acc), rtol=1e-4, atol=1e-5)


def test_multi_stream_batched_sort_same_length_sites():
    """Same-length unsorted sites (DIEN's hist + neg-hist shape) must stay
    exactly equivalent to the concatenated single stream — whatever sort
    strategy the queue uses internally (the batched variadic sort tried for
    VERDICT r4 #6 was reverted as a measured model-level regression; this
    parity contract is strategy-independent)."""
    rng = np.random.default_rng(5)
    rows, L, pack, dim = 128, 128, 4, 32
    stack = jnp.asarray(rng.normal(size=(rows, L)).astype(np.float32))
    acc = jnp.full((rows, L), 0.1, jnp.float32)
    n = 512
    site_ids = [jnp.asarray(rng.integers(0, rows * pack, size=n,
                                         dtype=np.int32)) for _ in range(2)]
    site_ct = [jnp.asarray(rng.normal(size=(n, dim)).astype(np.float32))
               for _ in range(2)]
    lids, ct = jnp.concatenate(site_ids), jnp.concatenate(site_ct)
    kw = dict(pack=pack, dim=dim, lr=0.05, tile_rows=64, chunk=128)
    multi = jax.jit(lambda s, a, i, c, sites: fused_adagrad_apply(
        s, a, i, c, sites=sites, **kw))(
        stack, acc, lids, ct,
        [(i, c, None) for i, c in zip(site_ids, site_ct)])
    single = jax.jit(lambda s, a, i, c: fused_adagrad_apply(
        s, a, i, c, **kw))(stack, acc, lids, ct)
    for a, b in zip(multi, single):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
