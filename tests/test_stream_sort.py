"""Blocked single-key sort (ops/stream_sort.py): sortedness, permutation
validity, parity of the presorted fused-Adagrad path, and fallbacks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommender_system_tpu.ops.stream_sort import blocked_sort
from recommender_system_tpu.ops.fused_adagrad import (fused_adagrad_apply,
                                                      fused_adagrad_ref)


def _check(rows, col_ranges):
    out = blocked_sort(jnp.asarray(rows), col_ranges)
    assert out is not None
    slid, order = np.asarray(out[0]), np.asarray(out[1])
    flat = np.asarray(rows).reshape(-1)
    assert slid.shape == flat.shape == order.shape
    assert (np.diff(slid) >= 0).all(), "stream must be globally sorted"
    assert sorted(order.tolist()) == list(range(flat.size)), "not a permutation"
    np.testing.assert_array_equal(slid, flat[order])
    return slid, order


def test_single_column_blocks():
    rng = np.random.default_rng(0)
    B, vocabs = 64, [100, 37, 250]
    offsets = np.concatenate([[0], np.cumsum(vocabs)[:-1]])
    rows = np.stack([offsets[f] + rng.integers(0, vocabs[f], B)
                     for f in range(3)], axis=1)
    _check(rows, list(zip(offsets.tolist(), vocabs)))


def test_adjacent_tables_sharing_packed_row():
    # vocab 13 with pack 14: table 1 starts mid-packed-row of table 0
    rng = np.random.default_rng(1)
    B = 32
    ranges = [(0, 13), (13, 29), (42, 5)]
    rows = np.stack([o + rng.integers(0, v, B) for o, v in ranges], axis=1)
    _check(rows, ranges)


def test_shared_table_group():
    # two columns on the SAME table (identical range) merge into one block
    rng = np.random.default_rng(2)
    B = 48
    ranges = [(0, 50), (50, 20), (0, 50), (50, 20)]
    rows = np.stack([o + rng.integers(0, v, B) for o, v in ranges], axis=1)
    _check(rows, ranges)


def test_varlen_single_block_1d():
    rng = np.random.default_rng(3)
    ids = 7 + rng.integers(0, 900, 257)  # [N] from one table (7, 900)
    _check(ids, [(7, 900)])


def test_fallback_cases():
    rng = np.random.default_rng(4)
    rows = rng.integers(0, 10, (8, 2))
    # partially overlapping distinct ranges
    assert blocked_sort(jnp.asarray(rows), [(0, 10), (5, 10)]) is None
    # ragged groups: table A used by 2 columns, table B by 1
    rows3 = rng.integers(0, 10, (8, 3))
    assert blocked_sort(jnp.asarray(rows3),
                        [(0, 10), (0, 10), (10, 10)]) is None
    # key bits exceed int31
    big = rng.integers(0, 2 ** 20, (1 << 11, 1))  # 20 + 11 = 31 bits: fits
    assert blocked_sort(jnp.asarray(big), [(0, 2 ** 20)]) is not None
    huge = rng.integers(0, 2 ** 28, (16, 1))
    assert blocked_sort(jnp.asarray(huge), [(0, 2 ** 28)]) is None


@pytest.mark.parametrize("pack,dim", [(14, 9), (16, 8)])
def test_presorted_fused_adagrad_matches_ref(pack, dim):
    rng = np.random.default_rng(5)
    rows_phys, B = 128, 96
    # three tables covering the stack's logical range
    vocabs = [500, 700, rows_phys * pack - 1200]
    offsets = np.concatenate([[0], np.cumsum(vocabs)[:-1]])
    ids2d = np.stack([offsets[f] + rng.integers(0, vocabs[f], B)
                      for f in range(3)], axis=1).astype(np.int32)
    ct = rng.normal(size=(B * 3, dim)).astype(np.float32)

    stack = jnp.asarray(rng.normal(size=(rows_phys, 128)).astype(np.float32))
    acc = jnp.full((rows_phys, 128), 0.1, jnp.float32)
    presorted = blocked_sort(jnp.asarray(ids2d),
                             list(zip(offsets.tolist(), vocabs)))
    assert presorted is not None
    lids = jnp.asarray(ids2d.reshape(-1))
    ctj = jnp.asarray(ct)

    new_s, new_a = jax.jit(lambda s, a, i, c, ps: fused_adagrad_apply(
        s, a, i, c, pack=pack, dim=dim, lr=0.05, tile_rows=64, chunk=128,
        presorted=ps))(stack, acc, lids, ctj, presorted)

    ct_r = ctj.astype(jnp.bfloat16).astype(jnp.float32)
    ref_s, ref_a = fused_adagrad_ref(stack, acc, lids, ct_r,
                                     pack=pack, dim=dim, lr=0.05)
    np.testing.assert_allclose(np.asarray(new_s), np.asarray(ref_s),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_a), np.asarray(ref_a),
                               rtol=1e-4, atol=1e-5)
