"""Fast embedding gradient: sorted work-queue scatter-add on the MXU (Pallas).

THE hot path of CTR training on TPU. The embedding backward is
``zeros((V, 128)).at[wide_ids].add(lane_shifted_cotangents)`` — XLA lowers it
to a sequential per-index update loop (measured 2.3ms for 213k updates into a
[186k, 128] lane-packed stack on v5e, 3.2ms including the lane-shift einsum),
which dominates the DeepFM train step. This module replaces it with a
work-queue kernel:

1. (XLA) sort the ids, gather the cotangents into sorted order, lane-shift
   them to their packed positions ([N, d] -> [N, 128]),
2. (XLA) build a static-length work queue of (table_subtile, chunk) pairs:
   each subtile of ``tile_rows`` output rows owns a *contiguous* range of the
   sorted update stream (``searchsorted``), split into chunk-aligned slices,
3. (Pallas) grid over work items; the scalar-prefetched queue drives the
   BlockSpec index maps, so Pallas's own pipeline machinery streams the
   (ids, grads) chunks and keeps the output subtile resident in VMEM across
   revisits (the matmul-k-loop pattern). Each step accumulates
   ``onehot(ids) @ grads_chunk`` on the **MXU** — scatter becomes matmul,
   race-free because the TPU grid is sequential.

This is strictly better than a fixed chunks-per-subtile layout: a hot row
(power-law ids) simply contributes more work items to its subtile, while the
pipeline keeps streaming.

Numerics: the MXU contracts f32 inputs at bf16x1 precision under
``--xla_allow_excess_precision`` (measured ~4e-3 relative on N(0,1) grads) —
the same precision XLA itself uses for every matmul in the model. Tests
compare in interpret mode (exact f32) and with loose tolerance on TPU.

``packed_take_fast`` wraps the lane-packed gather (``layers/embedding.py
packed_take``) with this as its custom VJP so every ``EmbeddingCollection``
lookup gets the fast backward. Replaces the reference's per-feature Keras
``Embedding`` gradient path (``utils/inputs.py:22-89``, ``layer/core.py:267``).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dispatch

_SENTINEL = jnp.int32(2 ** 30)


def _queue_kernel(wsub_ref, wchunk_ref, sids_ref, sgrads_ref, out_ref,
                  *, tile_rows: int, chunk: int):
    """One work item: accumulate one sorted-update chunk into one out subtile."""
    w = pl.program_id(0)
    sub = wsub_ref[w]
    prev = wsub_ref[jnp.maximum(w - 1, 0)]

    @pl.when((w == 0) | (prev != sub))
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = sub * tile_rows
    local = sids_ref[0, :] - base                      # [chunk] int32
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, chunk), 0)
    # bf16 operands -> single-pass MXU (f32 defaults to the slow multi-pass
    # path); accumulate f32. Onehot built in f32 first (an i1 mask from an
    # int32 compare has (8,128) tiling and cannot replicate into bf16 lanes).
    onehot = jnp.where(row_iota == local[None, :], jnp.float32(1),
                       jnp.float32(0)).astype(jnp.bfloat16)
    out_ref[:] += jnp.dot(onehot, sgrads_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)


def _build_queue(sids: jax.Array, n: int, num_rows: int, tile_rows: int,
                 chunk: int) -> Tuple[jax.Array, jax.Array, int, int, int]:
    """Static-length (subtile, chunk) work queue for a sorted id stream.

    Returns (w_sub[W], w_chunk[W], W, n_subtiles, pad_chunk). Bound:
    every subtile needs >=1 item (to zero its tile) and the stream splits
    into <= ceil(n/chunk) extra items, so W = ceil(n/chunk) + n_subtiles.
    """
    n_sub = -(-num_rows // tile_rows)
    W = -(-n // chunk) + n_sub
    bounds = jnp.arange(n_sub + 1, dtype=jnp.int32) * tile_rows
    ts = jnp.searchsorted(sids, bounds).astype(jnp.int32)  # [S+1]
    first_chunk = ts[:-1] // chunk                          # [S]
    counts = jnp.maximum(
        1, -((first_chunk * chunk - ts[1:]) // chunk))      # ceil div
    cum = jnp.cumsum(counts)
    total = cum[-1]
    w_idx = jnp.arange(W, dtype=jnp.int32)
    w_sub_raw = jnp.searchsorted(cum, w_idx, side="right").astype(jnp.int32)
    w_sub = jnp.minimum(w_sub_raw, n_sub - 1)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
    w_in = w_idx - offs[w_sub]
    pad_chunk = (n + chunk - 1) // chunk  # the all-sentinel chunk
    w_chunk = jnp.where(w_idx < total, first_chunk[w_sub] + w_in, pad_chunk)
    return w_sub, w_chunk.astype(jnp.int32), W, n_sub, pad_chunk


def _scatter_sorted(sids: jax.Array, sgrads: jax.Array, num_rows: int,
                    tile_rows: int, chunk: int) -> jax.Array:
    """Core: sorted ids [N] + lane-full grads [N, 128] -> [rows_pad, 128]."""
    n = sids.shape[0]
    w_sub, w_chunk, W, n_sub, pad_chunk = _build_queue(
        sids, n, num_rows, tile_rows, chunk)

    # pad the stream with one extra all-sentinel chunk (the target of padding
    # work items) and up to chunk alignment
    n_pad = (pad_chunk + 1) * chunk
    sids_p = jnp.full((1, n_pad), _SENTINEL, jnp.int32).at[0, :n].set(sids)
    sgrads_p = jnp.zeros((n_pad, 128), jnp.float32).at[:n].set(
        sgrads.astype(jnp.float32))

    kernel = functools.partial(_queue_kernel, tile_rows=tile_rows, chunk=chunk)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # w_sub, w_chunk
            grid=(W,),
            in_specs=[
                pl.BlockSpec((1, chunk), lambda w, ws, wc: (0, wc[w])),
                pl.BlockSpec((chunk, 128), lambda w, ws, wc: (wc[w], 0)),
            ],
            out_specs=pl.BlockSpec((tile_rows, 128),
                                   lambda w, ws, wc: (ws[w], 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_sub * tile_rows, 128), jnp.float32),
        interpret=dispatch.interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=2 * W * tile_rows * chunk * 128,
            bytes_accessed=4 * (n_pad * 129 + n_sub * tile_rows * 128),
            transcendentals=0),
    )(w_sub, w_chunk, sids_p, sgrads_p)
    return out


def _lane_shift(ct: jax.Array, slot: jax.Array, pack: int, dim: int) -> jax.Array:
    """Place each d-dim cotangent row at its packed lane offset:
    out[n, slot[n]*dim + j] = ct[n, j]; zeros elsewhere. [N, d] -> [N, 128].

    Tile+mask formulation (cheaper than the one-hot einsum: one fused
    elementwise pass instead of an [N, P, d] intermediate)."""
    n = ct.shape[0]
    lanes = jnp.arange(128)
    col = jnp.where(lanes < pack * dim, lanes % dim, dim)
    ct_pad = jnp.pad(ct, ((0, 0), (0, 1)))  # col==dim -> 0
    tiled = jnp.take(ct_pad, col, axis=1)
    mask = ((lanes[None, :] // dim) == slot[:, None]) & (
        lanes[None, :] < pack * dim)
    return jnp.where(mask, tiled, 0.0).astype(jnp.float32)


def scatter_add_dense(ids: jax.Array, grads: jax.Array, num_rows: int,
                      tile_rows: int = 512, chunk: int = 1024) -> jax.Array:
    """``zeros((num_rows, d)).at[ids].add(grads)`` via the work-queue kernel.

    ids ``[N]`` int (rows assumed in range), grads ``[N, d]`` with d <= 128
    -> ``[num_rows, d]`` f32.
    """
    N, d = grads.shape
    assert d <= 128, "pack wider dims through multiple lookups"
    sids, order = jax.lax.sort([ids.astype(jnp.int32),
                                jnp.arange(N, dtype=jnp.int32)], num_keys=1)
    sg = jnp.take(grads, order, axis=0).astype(jnp.float32)
    if d < 128:
        sg = jnp.pad(sg, ((0, 0), (0, 128 - d)))
    out = _scatter_sorted(sids, sg, num_rows, tile_rows, chunk)
    return out[:num_rows, :d]


def packed_scatter_add(lids: jax.Array, ct: jax.Array, num_wide_rows: int,
                       pack: int, dim: int, tile_rows: int = 512,
                       chunk: int = 1024) -> jax.Array:
    """Backward of a lane-packed gather: logical ids [N] + cotangents [N, d]
    -> dense wide-row gradient [num_wide_rows, 128] (or [., d] when pack==1).

    Fuses sort + reorder + lane-shift + scatter; the shift happens inside the
    (XLA-fused) gather-into-sorted-order pass, so the [N, 128] stream is
    materialized exactly once.
    """
    N = lids.shape[0]
    slid, order = jax.lax.sort([lids.astype(jnp.int32),
                                jnp.arange(N, dtype=jnp.int32)], num_keys=1)
    sct = jnp.take(ct, order, axis=0)
    if pack == 1:
        swid = slid
        sg = sct.astype(jnp.float32)
        if dim < 128:
            sg = jnp.pad(sg, ((0, 0), (0, 128 - dim)))
    else:
        swid = slid // pack
        sg = _lane_shift(sct, slid % pack, pack, dim)
    out = _scatter_sorted(swid, sg, num_wide_rows, tile_rows, chunk)
    if pack == 1 and dim < 128:
        return out[:num_wide_rows, :dim]
    return out[:num_wide_rows]


def scatter_add_dense_ref(ids, grads, num_rows):
    """XLA reference (the slow path this module replaces)."""
    out = jnp.zeros((num_rows, grads.shape[-1]), jnp.float32)
    return out.at[ids].add(grads.astype(jnp.float32))


# ---------------------------------------------------------------------------
# packed_take with the fast backward
# ---------------------------------------------------------------------------

def lane_select(wide: jax.Array, slot: jax.Array, pack: int,
                dim: int) -> jax.Array:
    """Pick each row's d-lane group from a lane-packed wide row:
    ``out[n, j] = wide[n, slot[n]*dim + j]``. [N, 128] -> [N, dim].

    Formulation notes (all measured at N=426k, d=9, P=14 on v5e):
    - mask + tiny MXU matmul (this impl): 0.67 + 0.32 ms. The mask pass
      materializes a masked [N, 128] copy because the conv emitter cannot
      input-fuse the select, but both passes run near HBM bandwidth.
    - P-way select-add over ``wide[:, s*d:(s+1)*d]`` slices: 16 *unaligned*
      lane slices per tile -> lane-rotate relayouts; regressed the DeepFM
      step 2.4x. Do not revisit without checking Mosaic gets aligned slices.
    - ``reshape(-1, P, d).sum(1)``: lane->sublane relayout, ~0.6 ms extra.
    """
    lanes = jnp.arange(pack * dim)
    keep = (lanes[None, :] // dim) == slot[:, None]
    picked = jnp.where(keep, wide[:, : pack * dim], 0)
    r_sel = (lanes[:, None] % dim) == jnp.arange(dim)[None, :]
    # HIGHEST precision keeps the dot f32 so XLA cannot hoist a bf16
    # convert into the gather (the bf16-output row gather pays (16,128)-tile
    # repacking per row: 1.73 vs 0.45ms at N=213k)
    return jnp.dot(picked, r_sel.astype(wide.dtype),
                   preferred_element_type=wide.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def _packed_take_impl(stack: jax.Array, lids: jax.Array, pack: int,
                      dim: int) -> jax.Array:
    """Forward math shared with layers.embedding.packed_take."""
    if pack == 1:
        return jax.lax.optimization_barrier(jnp.take(stack, lids, axis=0))
    # NO barrier here: XLA output-fuses the lane select into the row gather,
    # which removes the standalone mask pass entirely (bench 2.92 -> 3.20M
    # ex/s). An earlier config needed a barrier to keep the fast row-gather
    # emitter; re-measure before re-adding one.
    wide = jnp.take(stack, lids // pack, axis=0)       # [N, 128]
    return lane_select(wide, lids % pack, pack, dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def packed_take_fast(stack: jax.Array, lids: jax.Array, pack: int,
                     dim: int) -> jax.Array:
    """Lane-packed gather ([rows,128] stack, logical ids [N]) -> [N, dim]
    whose backward runs the work-queue scatter kernel (measured 2.6x the
    XLA einsum+scatter path on v5e at the DeepFM bench shape)."""
    return _packed_take_impl(stack, lids, pack, dim)


def _packed_take_fast_fwd(stack, lids, pack, dim):
    return _packed_take_impl(stack, lids, pack, dim), (lids, stack.shape[0])


def _packed_take_fast_bwd(pack, dim, res, ct):
    lids, num_wide_rows = res
    dstack = packed_scatter_add(lids, ct, num_wide_rows, pack, dim)
    return dstack, None


packed_take_fast.defvjp(_packed_take_fast_fwd, _packed_take_fast_bwd)
