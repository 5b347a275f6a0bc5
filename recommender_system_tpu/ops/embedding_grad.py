"""Fast embedding gradient: scatter-add as sorted one-hot matmuls (Pallas).

THE hot path of CTR training on TPU. XLA lowers ``table.at[ids].add(grads)``
to a sequential per-index loop — measured 18.9ms for 213k rows into a
[2.6M, 8] table on v5e (~89ns/row), which dominated the whole DeepFM train
step (17.9ms). This module replaces it:

1. (XLA) argsort the ids, gather the grads into sorted order (~1.3ms),
2. (XLA) ``searchsorted`` the per-table-tile boundaries — each tile of
   ``tile_rows`` rows owns a *contiguous* range of the sorted updates,
3. (Pallas) grid over table tiles; each tile streams its update range from
   HBM in chunks, builds a ``[tile_rows, chunk]`` one-hot in VMEM and
   accumulates ``onehot @ grads_chunk`` on the **MXU** — scatter becomes
   matmul, fully vectorized, race-free by construction (disjoint tiles).

The result is the dense cotangent for the table (zeros + scattered adds),
exactly ``jnp.zeros((V, d)).at[ids].add(grads)``. ``sparse_lookup`` wraps
``jnp.take`` with this as its custom VJP so every ``EmbeddingCollection``
lookup gets the fast backward.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dispatch


def _scatter_kernel(tstarts_ref, sids_ref, sgrads_ref, out_ref,
                    ids_vmem, grads_vmem, sem_ids, sem_grads,
                    *, tile_rows: int, chunk: int, dim: int, subtiles: int):
    """One grid step covers ``subtiles`` consecutive table sub-tiles.

    Each sub-tile owns a contiguous range of the sorted update stream
    (scalar-prefetched ``tstarts``). The first chunk DMA of every sub-tile is
    software-pipelined across the static sub-tile loop (double-buffered
    scratch), so DMA latency overlaps the one-hot matmul of the previous
    sub-tile; the rare multi-chunk tails run serially. Entries outside a
    sub-tile's row range can appear in its (chunk-aligned) stream but the
    row-match mask keeps them out — disjoint rows, race-free.
    """
    g0 = pl.program_id(0) * subtiles
    out_ref[:] = jnp.zeros_like(out_ref)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, chunk), 0)

    def chunk_start(s):
        return pl.multiple_of((tstarts_ref[g0 + s] // chunk) * chunk, chunk)

    def issue(s, slot):
        idx = chunk_start(s)
        cp_i = pltpu.make_async_copy(
            sids_ref.at[pl.ds(0, 1), pl.ds(idx, chunk)],
            ids_vmem.at[slot], sem_ids.at[slot])
        cp_g = pltpu.make_async_copy(
            sgrads_ref.at[pl.ds(idx, chunk), :],
            grads_vmem.at[slot], sem_grads.at[slot])
        cp_i.start()
        cp_g.start()

    def wait(s, slot):
        idx = chunk_start(s)
        pltpu.make_async_copy(
            sids_ref.at[pl.ds(0, 1), pl.ds(idx, chunk)],
            ids_vmem.at[slot], sem_ids.at[slot]).wait()
        pltpu.make_async_copy(
            sgrads_ref.at[pl.ds(idx, chunk), :],
            grads_vmem.at[slot], sem_grads.at[slot]).wait()

    def accum(s, slot, base, row_offset):
        local = ids_vmem[slot, 0, :] - base  # [chunk]
        onehot = jnp.where(row_iota == local[None, :],
                           jnp.float32(1.0), jnp.float32(0.0))
        out_ref[pl.ds(row_offset, tile_rows), :] += jnp.dot(
            onehot, grads_vmem[slot, :, :dim],
            preferred_element_type=jnp.float32)

    issue(0, 0)
    for s in range(subtiles):
        slot = s % 2
        if s + 1 < subtiles:
            issue(s + 1, (s + 1) % 2)
        wait(s, slot)
        base = (g0 + s) * tile_rows
        row_offset = s * tile_rows
        accum(s, slot, base, row_offset)

        # rare tail: more than one chunk of updates for this sub-tile
        end = tstarts_ref[g0 + s + 1]

        def more(state):
            idx, _ = state
            idx = pl.multiple_of(idx, chunk)
            cp_i = pltpu.make_async_copy(
                sids_ref.at[pl.ds(0, 1), pl.ds(idx, chunk)],
                ids_vmem.at[slot], sem_ids.at[slot])
            cp_g = pltpu.make_async_copy(
                sgrads_ref.at[pl.ds(idx, chunk), :],
                grads_vmem.at[slot], sem_grads.at[slot])
            cp_i.start()
            cp_g.start()
            cp_i.wait()
            cp_g.wait()
            accum(s, slot, base, row_offset)
            return idx + chunk, 0

        jax.lax.while_loop(lambda st: st[0] < end, more,
                           (chunk_start(s) + chunk, 0))


def scatter_add_dense(ids: jax.Array, grads: jax.Array, num_rows: int,
                      tile_rows: int = 2048, chunk: int = 128,
                      subtiles: int = 32) -> jax.Array:
    """``zeros((num_rows, d)).at[ids].add(grads)`` via the sorted one-hot
    matmul kernel. ids ``[N]`` int32, grads ``[N, d]`` -> ``[num_rows, d]``."""
    N, d = grads.shape
    assert d <= 128, "pack wider dims through multiple lookups"
    grid = pl.cdiv(num_rows, tile_rows * subtiles)
    num_subtiles = grid * subtiles
    rows_padded = num_subtiles * tile_rows

    order = jnp.argsort(ids)
    sids = ids[order].astype(jnp.int32)
    sgrads = jnp.take(grads, order, axis=0)

    # pad the streams so chunk DMAs never run off the end (sentinel ids are
    # out of every tile's range), and lane-pad the grads to 128 — manual DMA
    # slices require a 128-aligned minor dimension
    pad = chunk
    sids = jnp.concatenate(
        [sids, jnp.full((pad,), jnp.int32(rows_padded + 1))])[None, :]
    sgrads = jnp.concatenate([sgrads, jnp.zeros((pad, d), grads.dtype)])
    lane_pad = 128 - d
    if lane_pad:
        sgrads = jnp.pad(sgrads, ((0, 0), (0, lane_pad)))

    tile_bounds = jnp.arange(num_subtiles + 1, dtype=jnp.int32) * tile_rows
    tstarts = jnp.searchsorted(sids[0, :N], tile_bounds).astype(jnp.int32)

    kernel = functools.partial(_scatter_kernel, tile_rows=tile_rows,
                               chunk=chunk, dim=d, subtiles=subtiles)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # sids (HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),  # sgrads (HBM)
            ],
            out_specs=pl.BlockSpec((tile_rows * subtiles, d),
                                   lambda t, tstarts: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 1, chunk), jnp.int32),
                pltpu.VMEM((2, chunk, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((rows_padded, d), jnp.float32),
        interpret=dispatch.interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=2 * tile_rows * (N + num_subtiles * chunk) * d,
            bytes_accessed=4 * (N * (d + 1) + rows_padded * d),
            transcendentals=0),
    )(tstarts, sids, sgrads.astype(jnp.float32))
    return out[:num_rows]


def scatter_add_dense_ref(ids, grads, num_rows):
    """XLA reference (the slow path this module replaces)."""
    out = jnp.zeros((num_rows, grads.shape[-1]), jnp.float32)
    return out.at[ids].add(grads.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sparse_lookup(table: jax.Array, ids: jax.Array,
                  use_pallas: Optional[bool] = None) -> jax.Array:
    """``jnp.take(table, ids, axis=0)`` with the fast scatter backward.

    ids may be any shape; result is ``ids.shape + (d,)``. On TPU the backward
    runs the one-hot-matmul kernel (measured ~12x over XLA scatter); on CPU
    (or ``use_pallas=False``) it falls back to ``at[].add``.
    """
    return jnp.take(table, ids, axis=0)


def _sparse_lookup_fwd(table, ids, use_pallas):
    return jnp.take(table, ids, axis=0), (ids, table.shape[0])


def _sparse_lookup_bwd(use_pallas, res, g):
    ids, num_rows = res
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    if dispatch.use_pallas(use_pallas) or (
            use_pallas is None and dispatch.on_tpu()):
        dtable = scatter_add_dense(flat_ids, flat_g, num_rows)
    else:
        dtable = scatter_add_dense_ref(flat_ids, flat_g, num_rows)
    return dtable, None


sparse_lookup.defvjp(_sparse_lookup_fwd, _sparse_lookup_bwd)
