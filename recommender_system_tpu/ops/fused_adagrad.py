"""Fused sparse Adagrad: the embedding backward IS the optimizer update.

Production CTR training on TPU spends its step time in three dense sweeps the
reference never had to think about (Keras updates each tiny ``Embedding``
densely, ``utils/inputs.py:22-56``): materializing the dense stack gradient
(scatter-add), reading it back, and the optimizer's full-table read-modify-
write. At bench scale (185k x 128 lane-packed stack, 213k updates/step) that
is ~3 HBM sweeps of 95 MB for 7.7 MB of actual gradient information.

This module replaces all of it with ONE Pallas kernel pass:

1. (XLA) sort ids, reorder + lane-shift cotangents to packed lanes (bf16),
2. (XLA) build a static-length (subtile, chunk) work queue over the sorted
   stream — **only subtiles that receive updates get work items** (empty
   subtiles are never visited; their param/acc tiles are untouched via
   ``input_output_aliases`` in-place update),
3. (Pallas) per work item, accumulate ``onehot(ids) @ grads`` on the MXU into
   a VMEM scratch tile; on a subtile's LAST work item apply optax-exact
   Adagrad in-place:  ``acc += G*G;  param -= lr * G * rsqrt(acc + eps)``
   (``optax.scale_by_rss`` semantics incl. the ``acc > 0`` guard and
   duplicate-id pre-aggregation, verified against dense optax in tests).

Gradient flow into this kernel comes from flax ``perturb`` hooks on the
lookup outputs (see ``layers/embedding.py``) — the table itself is never
differentiated, so XLA never builds a dense-gradient buffer at all.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dispatch
from .embedding_grad import _SENTINEL, _lane_shift


def _lane_shift_matmul(ct: jax.Array, slot: jax.Array, pack: int, dim: int,
                       out_dtype=jnp.float32) -> jax.Array:
    """Lane shift as (MXU tile-matmul) x (fused slot mask): [N, d] -> [N, 128]
    with ``out[n, slot[n]*d + j] = ct[n, j]``.

    ``ct @ SEL`` replicates each row across all pack slots (SEL[j, l] = 1 iff
    l % d == j, l < pack*d) and the slot mask keeps one copy. Avoids the
    lane-gather of ``_lane_shift`` (measured 0.22 vs 0.5 ms at N=213k on
    v5e); costs one matmul rounding, same as the downstream bf16 contraction.
    """
    return _slot_mask(_lane_tile_matmul(ct, pack, dim, out_dtype), slot, dim)


def _lane_tile_matmul(ct, pack, dim, out_dtype):
    """The replication half of :func:`_lane_shift_matmul`: [N, d] -> [N, 128]
    with each row copied into every pack slot (no slot mask yet)."""
    lanes = jnp.arange(128)
    sel = ((lanes[None, :] % dim) == jnp.arange(dim)[:, None]) & (
        lanes < pack * dim)[None, :]
    return jnp.dot(ct.astype(out_dtype), sel.astype(out_dtype),
                   preferred_element_type=out_dtype)


def _slot_mask(tiled, slot, dim):
    """Keep one pack-slot copy per row: ``out[n, l] = tiled[n, l]`` iff
    ``l // dim == slot[n]``.  Applied AFTER the cotangent-reorder gather in
    the stream preps. The mask commutes with the row gather (it is
    per-row), so both placements are legal; both were measured at the DIEN
    shape (real chip, 2026-08-21): the post-gather placement compiles to a
    standalone multi-output compare-select fusion over the gathered
    streams (0.87 ms/step across two 409k-row sites in the step trace —
    it does NOT epilogue-fuse into the gather), but moving it pre-gather
    in batch order right after the lane-tile dot (hoping for dot-epilogue
    fusion) measured WORSE end-to-end (DIEN 8192 bf16 full step 19.58 ms
    vs 19.28-19.44 post-gather). Post-gather stays as the measured-best
    placement."""
    mask = (jnp.arange(128)[None, :] // dim) == slot[:, None]
    return jnp.where(mask, tiled, jnp.zeros((), tiled.dtype))


def _choose_tile_rows(num_rows: int, preferred: int = 512) -> int:
    for cand in (preferred, 512, 256, 128, 64):
        if cand <= preferred and num_rows % cand == 0:
            return cand
    raise ValueError(f"stack rows {num_rows} not divisible by 64")


def _stream_chunk_counts(swid: jax.Array, bounds: jax.Array, chunk: int):
    """Per subtile of one SORTED id stream: (index of its first chunk,
    number of chunks overlapping its id span). Empty spans get 0 chunks."""
    ts = jnp.searchsorted(swid, bounds).astype(jnp.int32)    # [S+1]
    first_chunk = ts[:-1] // chunk                            # [S]
    span = ts[1:] - ts[:-1]
    counts = jnp.where(
        span > 0, -((first_chunk * chunk - ts[1:]) // chunk), 0)
    return first_chunk, counts


def _queue_subtile_map(cum: jax.Array, n_sub: int, W: int):
    """Map work-item index -> owning subtile, with padding attachment.

    ``cum``: cumulative per-subtile work-item counts. Returns
    (w_idx, w_sub, sub_c, w_in, total): ``w_sub`` is the subtile per item
    (padding items attach to the last non-empty subtile so its pending G
    gets applied on the final item), ``sub_c`` the clamped raw subtile,
    ``w_in`` the item's index within its subtile."""
    total = cum[-1]
    w_idx = jnp.arange(W, dtype=jnp.int32)
    # w_sub_raw = searchsorted(cum, w_idx, 'right'), vectorized as one
    # compare+reduce (the scan form is a latency chain of tiny ops)
    w_sub_raw = (cum[None, :] <= w_idx[:, None]).sum(
        axis=1, dtype=jnp.int32)
    sub_c = jnp.minimum(w_sub_raw, n_sub - 1)
    last_sub = (cum < total).sum(dtype=jnp.int32)  # first idx reaching total
    w_sub = jnp.where(w_idx < total, sub_c,
                      jnp.minimum(last_sub, n_sub - 1))
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
    w_in = w_idx - offs[sub_c]
    return w_idx, w_sub, sub_c, w_in, total


def _build_queue_sparse(sids: jax.Array, n: int, num_rows: int,
                        tile_rows: int, chunk: int):
    """(subtile, chunk) work queue over a sorted id stream, skipping empty
    subtiles. Static length W = ceil(n/chunk) + n_subtiles (upper bound);
    unused slots become padding items that point at the pad chunk and attach
    to the last visited subtile (zero contribution, cheap predicated skip).
    """
    n_sub = -(-num_rows // tile_rows)
    W = -(-n // chunk) + n_sub
    bounds = jnp.arange(n_sub + 1, dtype=jnp.int32) * tile_rows
    first_chunk, counts = _stream_chunk_counts(sids, bounds, chunk)
    cum = jnp.cumsum(counts)
    w_idx, w_sub, sub_c, w_in, total = _queue_subtile_map(cum, n_sub, W)
    pad_chunk = (n + chunk - 1) // chunk  # one past the last real chunk
    w_chunk = jnp.where(w_idx < total, first_chunk[sub_c] + w_in, pad_chunk)
    return w_sub, w_chunk.astype(jnp.int32), W, n_sub, pad_chunk


def _chunk_onehot(sids_ref, sub, tile_rows, chunk):
    """[tile_rows, chunk] bf16 one-hot of this chunk's subtile-local ids.

    bf16 operands -> single-pass MXU (f32 inputs default to the multi-pass
    path: measured 4.0ms vs ~1ms for this kernel); f32 accumulation. Build
    the onehot in f32 first — an i1 mask from an int32 compare has (8,128)
    tiling and Mosaic cannot replicate it into bf16's (16,128) lanes
    directly."""
    local = sids_ref[0, :] - sub * tile_rows                 # [chunk]
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (tile_rows, chunk), 0)
    return jnp.where(row_iota == local[None, :], jnp.float32(1),
                     jnp.float32(0)).astype(jnp.bfloat16)


def _fused_adagrad_kernel(wsub_ref, wchunk_ref, hyper_ref, sids_ref,
                          sgrads_ref, param_ref, acc_ref,
                          param_out_ref, acc_out_ref, gacc,
                          *, tile_rows: int, chunk: int, W: int,
                          pad_chunk: int, eps: float, zero=True,
                          accumulate=True):
    w = pl.program_id(0)
    sub = wsub_ref[w]
    prev = wsub_ref[jnp.maximum(w - 1, 0)]

    if zero:
        @pl.when((w == 0) | (prev != sub))
        def _zero():
            gacc[:] = jnp.zeros_like(gacc)

    if accumulate:
        @pl.when(wchunk_ref[w] != pad_chunk)
        def _accumulate():
            onehot = _chunk_onehot(sids_ref, sub, tile_rows, chunk)
            gacc[:] += jnp.dot(onehot, sgrads_ref[:].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

    nxt = wsub_ref[jnp.minimum(w + 1, W - 1)]

    @pl.when((w == W - 1) | (nxt != sub))
    def _apply():
        g = gacc[:]
        lr = hyper_ref[0]
        new_acc = acc_ref[:] + g * g
        acc_out_ref[:] = new_acc
        inv = jnp.where(new_acc > 0,
                        jax.lax.rsqrt(new_acc + jnp.float32(eps)),
                        jnp.float32(0))
        param_out_ref[:] = param_ref[:] - lr * g * inv


def _prep_update_stream(stack, lids, ct, *, pack, dim, tile_rows, chunk,
                        stream_dtype, presorted, reorder):
    """Shared prep for every fused sparse optimizer: sort ids, build the
    (subtile, chunk) work queue, reorder + lane-shift cotangents into the
    padded sorted stream. Returns
    (w_sub, w_chunk, W, n_sub, pad_chunk, sids_p, sg_p, tile_rows)."""
    N = lids.shape[0]
    num_rows, L = stack.shape
    tile_rows = _choose_tile_rows(num_rows, tile_rows)

    if presorted is not None:
        slid, order = presorted
        slid = slid.astype(jnp.int32)
        order = order.astype(jnp.int32)
    else:
        slid, order = jax.lax.sort([lids.astype(jnp.int32),
                                    jnp.arange(N, dtype=jnp.int32)],
                                   num_keys=1)
    swid = slid // pack if pack > 1 else slid

    w_sub, w_chunk, W, n_sub, pad_chunk = _build_queue_sparse(
        swid, N, num_rows, tile_rows, chunk)
    n_pad = (pad_chunk + 1) * chunk
    # pad BEFORE reorder/lane-shift so the wide [n_pad, L] stream is
    # materialized exactly once (tail rows gather junk grads, but their
    # sids are SENTINEL so the kernel's onehot never matches them)
    order_p = jnp.pad(order, (0, n_pad - N))
    # The cotangent reorder gather dominates this prep, and XLA compiles it
    # differently in straight-line jit vs inside a lax.scan body, so the
    # order of (reorder, lane-shift) is a measured PER-PATH choice
    # (``reorder`` arg, DeepFM batch 8192 on v5e):
    # - take_first: gather the narrow [N, d] cotangents (barrier'd; XLA's
    #   {0,1}-layout lane-gather runs ~0.4ms/213k rows in straight-line jit),
    #   then lane-shift. Single-step: 2,985us/step vs 4,449 shift-first.
    #   Inside scan, bfloat16-propagation demotes this gather to bf16
    #   col-major (2.25ms/427k rows) — even through the barrier.
    # - shift_first: lane-shift in batch order (matmul output is row-major
    #   bf16), then gather wide rows (1.28ms/427k, per-row bound). Scan
    #   bench: 3.20M ex/s vs 2.48M take-first.
    if reorder == "auto":
        # measured rule (v5e): the narrow-cotangent lane-gather only wins in
        # straight-line jit AND for strongly-packed stacks (d=8/9: 2,985 vs
        # 4,449us DeepFM). At pack=4 (d=32, DIN) the wide-row reorder is
        # cheaper even single-step (11,348 vs 13,090us).
        reorder = "take_first" if pack >= 8 else "shift_first"
    if reorder == "take_first":
        sct = jax.lax.optimization_barrier(
            jnp.take(ct, order_p, axis=0))                # [n_pad, dim]
        if pack == 1:
            sg_p = sct.astype(stream_dtype)
            if L > dim:
                sg_p = jnp.pad(sg_p, ((0, 0), (0, L - dim)))
        else:
            slot_p = jnp.pad(slid, (0, n_pad - N)) % pack
            sg_p = _lane_shift_matmul(sct, slot_p, pack, dim, stream_dtype)
    else:
        if pack == 1:
            sg = ct.astype(stream_dtype)
            if L > dim:
                sg = jnp.pad(sg, ((0, 0), (0, L - dim)))
            sg_p = jax.lax.optimization_barrier(
                jnp.take(sg, order_p, axis=0))
        else:
            # slot mask AFTER the reorder gather: output-fuses into the
            # gather (the pre-gather mask was a standalone [N,128] select
            # pass); sorted slots come free from the sorted ids
            tiled = _lane_tile_matmul(ct, pack, dim, stream_dtype)
            slot_p = jnp.pad(slid % pack, (0, n_pad - N))
            sg_p = jax.lax.optimization_barrier(_slot_mask(
                jnp.take(tiled, order_p, axis=0), slot_p, dim))
    sids_p = jnp.full((1, n_pad), _SENTINEL, jnp.int32).at[0, :N].set(swid)
    return w_sub, w_chunk, W, n_sub, pad_chunk, sids_p, sg_p, tile_rows


def _prep_update_stream_multi(stack, sites, *, pack, dim, tile_rows, chunk,
                              stream_dtype):
    """Multi-stream prep: one sorted stream PER LOOKUP SITE (or per split of
    an oversize site), concatenated, with a work queue that visits every
    stream's chunks for a subtile before that subtile's apply.

    Why: the cotangent-reorder gather has a measured per-row cliff on v5e —
    ~3.5 ns/row while the source stays under ~2^19 rows (bf16), ~11.5 ns/row
    above it, and chunking the *indices* does not help (the source size is
    what matters — ``benchmarks/reorder_micro.py``, 2026-08-21). A DIEN step
    concatenates 3 lookup sites into one 836k-row stream and pays the cliff
    on every step; per-site streams keep every gather source below it.

    Exactness: all of a subtile's chunks (across all streams) accumulate into
    the same VMEM scratch before the single apply, so duplicate ids are still
    pre-summed per row before Adagrad squares them — identical semantics to
    the single-stream path, verified in tests.

    ``sites``: list of ``(lids, ct, presorted|None)``. Returns the same
    tuple as ``_prep_update_stream``.
    """
    num_rows, L = stack.shape
    tile_rows = _choose_tile_rows(num_rows, tile_rows)
    n_sub = -(-num_rows // tile_rows)
    bounds = jnp.arange(n_sub + 1, dtype=jnp.int32) * tile_rows

    # NOTE (negative result, 2026-08-21): batching the pair sorts of
    # same-length unsorted sites into ONE [S, N] variadic lax.sort (VERDICT
    # r4 #6, "one sort instead of two" for DIEN's hist + neg-hist) was
    # measured at MODEL level and regresses badly — XLA's batched variadic
    # sort is far slower than S independent 1-D sorts: DIN 16384 17.8 ->
    # 21.4 ms, DIEN 8192 20.6 -> 23.9 ms (model_step --fused, real chip).
    # Per-site 1-D pair sorts stay.  (blocked_sort can't help these sites:
    # vocab 200k x 409k rows exceeds the int31 packed-key budget.)
    seg_sids, seg_sg, site_bases = [], [], []
    first_chunks, counts_list = [], []
    base = 0  # running chunk offset of this site's region
    for site_i, (lids, ct, presorted) in enumerate(sites):
        N = lids.shape[0]
        if presorted is not None:
            slid = presorted[0].astype(jnp.int32)
            order = presorted[1].astype(jnp.int32)
        else:
            slid, order = jax.lax.sort(
                [lids.astype(jnp.int32), jnp.arange(N, dtype=jnp.int32)],
                num_keys=1)
        swid = slid // pack if pack > 1 else slid
        n_chunks = -(-N // chunk)
        n_pad = n_chunks * chunk
        order_p = jnp.pad(order, (0, n_pad - N))
        # shift-first (matmul output is row-major bf16, the layout the fast
        # per-row gather wants); each site's source is below the cliff; the
        # slot mask runs AFTER the gather so it output-fuses into it
        if pack == 1:
            sg = ct.astype(stream_dtype)
            if L > dim:
                sg = jnp.pad(sg, ((0, 0), (0, L - dim)))
            sg_p = jax.lax.optimization_barrier(
                jnp.take(sg, order_p, axis=0))
        else:
            tiled = _lane_tile_matmul(ct, pack, dim, stream_dtype)
            slot_p = jnp.pad(slid % pack, (0, n_pad - N))
            sg_p = jax.lax.optimization_barrier(_slot_mask(
                jnp.take(tiled, order_p, axis=0), slot_p, dim))
        seg_sids.append(jnp.full((n_pad,), _SENTINEL, jnp.int32)
                        .at[:N].set(swid))
        seg_sg.append(sg_p)
        site_bases.append(base)
        first_chunk, counts = _stream_chunk_counts(swid, bounds, chunk)
        counts_list.append(counts)
        first_chunks.append(base + first_chunk)
        base += n_chunks
    # the global pad-chunk id lives one past the last real chunk; only the
    # SIDS concatenation materializes it (3.3 MB of int32) — the heavy
    # [*, L] streams stay SEPARATE per site and are fed to the kernel as
    # separate operands (the trace showed the old jnp.concatenate of the
    # per-site streams costing 1.13 ms/step at the DIEN shape: a pure
    # 836k x 128 bf16 copy the kernel never needed)
    pad_chunk = base
    seg_sids.append(jnp.full((chunk,), _SENTINEL, jnp.int32))
    sids_all = jnp.concatenate(seg_sids)[None, :]

    S = len(sites)
    FC = jnp.stack(first_chunks, axis=1)       # [n_sub, S] global chunk base
    CNT = jnp.stack(counts_list, axis=1)       # [n_sub, S]
    site_cum = jnp.cumsum(CNT, axis=1)         # within-subtile cumulative
    cum = jnp.cumsum(site_cum[:, -1])
    W = base + n_sub * S                        # static upper bound
    w_idx, w_sub, sub_c, w_in, total = _queue_subtile_map(cum, n_sub, W)
    sc = site_cum[sub_c]                       # [W, S]
    s_idx = jnp.minimum((sc <= w_in[:, None]).sum(axis=1, dtype=jnp.int32),
                        S - 1)
    site_off = jnp.concatenate(
        [jnp.zeros((n_sub, 1), jnp.int32), site_cum[:, :-1]], axis=1)
    w_in_site = w_in - jnp.take_along_axis(
        site_off[sub_c], s_idx[:, None], axis=1)[:, 0]
    w_chunk = jnp.take_along_axis(
        FC[sub_c], s_idx[:, None], axis=1)[:, 0] + w_in_site
    w_chunk = jnp.where(w_idx < total, w_chunk, pad_chunk)
    w_site = jnp.where(w_idx < total, s_idx, 0).astype(jnp.int32)
    return (w_sub, w_chunk.astype(jnp.int32), W, n_sub, pad_chunk,
            sids_all, seg_sg, site_bases, w_site, tile_rows)


def stream_split_rows() -> int:
    """Gather-cliff threshold: a gather source at/above this many rows pays
    the slow per-row path on v5e (measured cliff between 417,792 and 524,288
    rows — reorder_micro 2026-08-21); oversize sites are split into
    position-chunks below it. RST_STREAM_SPLIT_ROWS is read without an
    import-order trap, but inside a jitted train step the value is baked in
    at TRACE time — after the first compile a changed env var has no effect
    in-process, so A/B runs must use fresh processes (or clear the jit
    cache)."""
    return int(os.environ.get("RST_STREAM_SPLIT_ROWS", 458_752))


def split_oversize_sites(sites, max_rows=None):
    """Split any (lids, ct, presorted) site with more than ``max_rows`` rows
    (default :func:`stream_split_rows`) into position-chunks below the gather
    cliff (presorted info cannot survive a split — the parts re-sort)."""
    if max_rows is None:
        max_rows = stream_split_rows()
    out = []
    for lids, ct, presorted in sites:
        N = lids.shape[0]
        if N <= max_rows:
            out.append((lids, ct, presorted))
            continue
        k = -(-N // max_rows)
        step = -(-N // k)
        for i in range(0, N, step):
            out.append((lids[i:i + step], ct[i:i + step], None))
    return out


def _run_fused_kernel(kernel_body, hyper_vals, stack, states, lids, ct, *,
                      pack, dim, tile_rows, chunk, stream_dtype, presorted,
                      reorder, extra_static, sites=None):
    """Drive one fused sparse-optimizer Pallas kernel.

    ``states``: tuple of per-row state arrays shaped like ``stack`` (Adagrad
    acc, Adam m/v, SGD none) — all updated in place (aliased) alongside the
    params. Returns (new_stack, *new_states).
    """
    num_rows, L = stack.shape
    hyper = jnp.asarray(hyper_vals, jnp.float32)
    n_bufs = 1 + len(states)

    if sites is not None:
        # Split-stream path: the per-site sorted streams stay SEPARATE
        # kernel operands — no [total, L] concatenation is ever built (a
        # measured 1.13 ms/step pure copy at the DIEN 836k-row shape). Each
        # site operand's index map clamps the global chunk id into its own
        # range, so an inactive operand's block index is CONSTANT while
        # other sites stream (Pallas only re-DMAs a block when its index
        # changes): total stream DMA stays ~= the stream bytes. A tiny
        # pl.when chain copies the active block into VMEM scratch and the
        # unchanged single-stream kernel body runs against the scratch.
        (w_sub, w_chunk, W, n_sub, pad_chunk, sids_p, seg_sg, site_bases,
         w_site, tile_rows) = _prep_update_stream_multi(
            stack, split_oversize_sites(sites), pack=pack, dim=dim,
            tile_rows=tile_rows, chunk=chunk, stream_dtype=stream_dtype)
        n_pad = sids_p.shape[1]
        S = len(seg_sg)
        site_nchunks = [int(sg.shape[0]) // chunk for sg in seg_sg]

        body = functools.partial(
            kernel_body, tile_rows=tile_rows, chunk=chunk, W=W,
            pad_chunk=pad_chunk, zero=False, accumulate=False,
            **extra_static)

        def wrapper(ws_ref, wc_ref, wst_ref, hy_ref, sids_ref, *rest):
            sg_refs = rest[:S]
            bufs = rest[S:S + n_bufs]
            outs = rest[S + n_bufs:S + 2 * n_bufs]
            gacc = rest[S + 2 * n_bufs]
            w = pl.program_id(0)
            sub = ws_ref[w]
            prev = ws_ref[jnp.maximum(w - 1, 0)]

            # zero -> accumulate -> apply, in that order: the wrapper owns
            # zero + accumulate (the dot predicated on the active site, so
            # inactive blocks are neither copied nor re-DMA'd); the body
            # contributes only the optimizer apply (zero/accumulate=False)
            @pl.when((w == 0) | (prev != sub))
            def _zero():
                gacc[:] = jnp.zeros_like(gacc)

            @pl.when(wc_ref[w] != pad_chunk)
            def _accumulate():
                onehot = _chunk_onehot(sids_ref, sub, tile_rows, chunk)
                site = wst_ref[w]
                for s in range(S):
                    @pl.when(site == s)
                    def _(s=s):
                        gacc[:] += jnp.dot(
                            onehot, sg_refs[s][:].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)

            body(ws_ref, wc_ref, hy_ref, sids_ref, sg_refs[0], *bufs,
                 *outs, gacc)

        def site_spec(base, cnt):
            return pl.BlockSpec(
                (chunk, L),
                lambda w, ws, wc, wst, hy, base=base, cnt=cnt: (
                    jnp.minimum(jnp.maximum(wc[w] - base, 0), cnt - 1), 0))

        tile_spec = lambda w, ws, wc, wst, hy: (ws[w], 0)  # noqa: E731
        outs = pl.pallas_call(
            wrapper,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,  # w_sub, w_chunk, w_site, hyper
                grid=(W,),
                in_specs=[
                    pl.BlockSpec((1, chunk),
                                 lambda w, ws, wc, wst, hy: (0, wc[w])),
                ] + [site_spec(b, c)
                     for b, c in zip(site_bases, site_nchunks)]
                + [pl.BlockSpec((tile_rows, L), tile_spec)] * n_bufs,
                out_specs=[pl.BlockSpec((tile_rows, L), tile_spec)] * n_bufs,
                scratch_shapes=[pltpu.VMEM((tile_rows, L), jnp.float32)],
            ),
            out_shape=[jax.ShapeDtypeStruct((num_rows, L),
                                            jnp.float32)] * n_bufs,
            # param/state buffers update in place
            input_output_aliases={5 + S + i: i for i in range(n_bufs)},
            interpret=dispatch.interpret_mode(),
            cost_estimate=pl.CostEstimate(
                flops=2 * W * tile_rows * chunk * L,
                bytes_accessed=2 * n_pad * L + 4 * n_pad
                + 4 * 2 * n_bufs * n_sub * tile_rows * L,
                transcendentals=W * tile_rows * L,
            ),
        )(w_sub, w_chunk, w_site, hyper, sids_p, *seg_sg, stack, *states)
        return tuple(outs)

    (w_sub, w_chunk, W, n_sub, pad_chunk, sids_p, sg_p, tile_rows) = \
        _prep_update_stream(stack, lids, ct, pack=pack, dim=dim,
                            tile_rows=tile_rows, chunk=chunk,
                            stream_dtype=stream_dtype, presorted=presorted,
                            reorder=reorder)
    n_pad = sids_p.shape[1]

    kernel = functools.partial(
        kernel_body, tile_rows=tile_rows, chunk=chunk, W=W,
        pad_chunk=pad_chunk, **extra_static)
    tile_spec = lambda w, ws, wc, hy: (ws[w], 0)  # noqa: E731
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # w_sub, w_chunk, hyper
            grid=(W,),
            in_specs=[
                pl.BlockSpec((1, chunk), lambda w, ws, wc, hy: (0, wc[w])),
                pl.BlockSpec((chunk, L), lambda w, ws, wc, hy: (wc[w], 0)),
            ] + [pl.BlockSpec((tile_rows, L), tile_spec)] * n_bufs,
            out_specs=[pl.BlockSpec((tile_rows, L), tile_spec)] * n_bufs,
            scratch_shapes=[pltpu.VMEM((tile_rows, L), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((num_rows, L), jnp.float32)] * n_bufs,
        # param/state buffers update in place
        input_output_aliases={5 + i: i for i in range(n_bufs)},
        interpret=dispatch.interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=2 * W * tile_rows * chunk * L,
            bytes_accessed=2 * n_pad * L + 4 * n_pad
            + 4 * 2 * n_bufs * n_sub * tile_rows * L,
            transcendentals=W * tile_rows * L,
        ),
    )(w_sub, w_chunk, hyper, sids_p, sg_p, stack, *states)
    return tuple(outs)


def fused_adagrad_apply(
    stack: jax.Array, acc: jax.Array, lids: jax.Array, ct: jax.Array,
    *, pack: int, dim: int, lr, eps: float = 1e-7,
    tile_rows: int = 512, chunk: int = 1024, stream_dtype=jnp.float32,
    presorted=None, reorder: str = "auto", sites=None,
) -> Tuple[jax.Array, jax.Array]:
    """In-place Adagrad on a lane-packed stack from a sparse update stream.

    stack/acc ``[rows, L]`` f32 (L=128 lane-packed, or =dim unpacked),
    lids ``[N]`` logical row ids, ct ``[N, dim]`` cotangents, lr scalar.
    ``presorted``: optional ``(slid, order)`` from ``ops.stream_sort``
    (sorted logical ids + permutation) — skips the generic pair sort.
    Returns (new_stack, new_acc); the inputs are aliased (donated).
    Exactly matches ``optax.adagrad`` applied to the dense scatter-added
    gradient (duplicates pre-summed per row before squaring).
    """
    num_rows, L = stack.shape
    if L % 128 != 0 or num_rows % 64 != 0:
        # odd-width unpacked tables: no clean Pallas tiling — XLA fallback
        return fused_adagrad_ref(stack, acc, lids, ct, pack=pack, dim=dim,
                                 lr=lr, eps=eps)
    return _run_fused_kernel(
        _fused_adagrad_kernel, [lr], stack, (acc,), lids, ct, pack=pack,
        dim=dim, tile_rows=tile_rows, chunk=chunk, stream_dtype=stream_dtype,
        presorted=presorted, reorder=reorder, extra_static={"eps": eps},
        sites=sites)


def _dense_row_grad(stack, lids, ct, pack, dim):
    """Scatter-added dense row gradient [rows, L] (shared by the refs)."""
    num_rows, L = stack.shape
    if pack == 1:
        sg = ct.astype(jnp.float32)
        if L > dim:
            sg = jnp.pad(sg, ((0, 0), (0, L - dim)))
        wid = lids
    else:
        wid = lids // pack
        sg = _lane_shift(ct, lids % pack, pack, dim)
    return jnp.zeros((num_rows, L), jnp.float32).at[wid].add(sg)


def fused_adagrad_ref(stack, acc, lids, ct, *, pack, dim, lr, eps=1e-7):
    """XLA reference: dense scatter-add + optax-exact Adagrad (tests)."""
    g = _dense_row_grad(stack, lids, ct, pack, dim)
    new_acc = acc + g * g
    inv = jnp.where(new_acc > 0, jax.lax.rsqrt(new_acc + eps), 0.0)
    return stack - lr * g * inv, new_acc


# ---------------------------------------------------------------------------
# Fused sparse SGD
# ---------------------------------------------------------------------------

def _fused_sgd_kernel(wsub_ref, wchunk_ref, hyper_ref, sids_ref, sgrads_ref,
                      param_ref, param_out_ref, gacc,
                      *, tile_rows: int, chunk: int, W: int, pad_chunk: int,
                      zero=True, accumulate=True):
    w = pl.program_id(0)
    sub = wsub_ref[w]
    prev = wsub_ref[jnp.maximum(w - 1, 0)]

    if zero:
        @pl.when((w == 0) | (prev != sub))
        def _zero():
            gacc[:] = jnp.zeros_like(gacc)

    if accumulate:
        @pl.when(wchunk_ref[w] != pad_chunk)
        def _accumulate():
            onehot = _chunk_onehot(sids_ref, sub, tile_rows, chunk)
            gacc[:] += jnp.dot(onehot, sgrads_ref[:].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

    nxt = wsub_ref[jnp.minimum(w + 1, W - 1)]

    @pl.when((w == W - 1) | (nxt != sub))
    def _apply():
        param_out_ref[:] = param_ref[:] - hyper_ref[0] * gacc[:]


def fused_sgd_apply(
    stack: jax.Array, lids: jax.Array, ct: jax.Array,
    *, pack: int, dim: int, lr,
    tile_rows: int = 512, chunk: int = 1024, stream_dtype=jnp.float32,
    presorted=None, reorder: str = "auto", sites=None,
) -> Tuple[jax.Array]:
    """In-place SGD: ``param[row] -= lr * sum(grads of that row)``. Matches
    ``optax.sgd`` on the dense scatter-added gradient (the reference's
    training recipe, ``utils/compile_fit.py:12``). Returns ``(new_stack,)``.
    """
    num_rows, L = stack.shape
    if L % 128 != 0 or num_rows % 64 != 0:
        return fused_sgd_ref(stack, lids, ct, pack=pack, dim=dim, lr=lr)
    return _run_fused_kernel(
        _fused_sgd_kernel, [lr], stack, (), lids, ct, pack=pack, dim=dim,
        tile_rows=tile_rows, chunk=chunk, stream_dtype=stream_dtype,
        presorted=presorted, reorder=reorder, extra_static={}, sites=sites)


def fused_sgd_ref(stack, lids, ct, *, pack, dim, lr):
    g = _dense_row_grad(stack, lids, ct, pack, dim)
    return (stack - lr * g,)


# ---------------------------------------------------------------------------
# Fused sparse (lazy) Adam
# ---------------------------------------------------------------------------

def _fused_adam_kernel(wsub_ref, wchunk_ref, hyper_ref, sids_ref, sgrads_ref,
                       param_ref, m_ref, v_ref,
                       param_out_ref, m_out_ref, v_out_ref, gacc,
                       *, tile_rows: int, chunk: int, W: int, pad_chunk: int,
                       b1: float, b2: float, eps: float, dim: int,
                       zero=True, accumulate=True):
    w = pl.program_id(0)
    sub = wsub_ref[w]
    prev = wsub_ref[jnp.maximum(w - 1, 0)]

    if zero:
        @pl.when((w == 0) | (prev != sub))
        def _zero():
            gacc[:] = jnp.zeros_like(gacc)

    if accumulate:
        @pl.when(wchunk_ref[w] != pad_chunk)
        def _accumulate():
            onehot = _chunk_onehot(sids_ref, sub, tile_rows, chunk)
            gacc[:] += jnp.dot(onehot, sgrads_ref[:].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

    nxt = wsub_ref[jnp.minimum(w + 1, W - 1)]

    @pl.when((w == W - 1) | (nxt != sub))
    def _apply():
        g = gacc[:]
        L = g.shape[1]
        lr, bc1, bc2 = hyper_ref[0], hyper_ref[1], hyper_ref[2]
        # LAZY Adam: only rows that received a gradient this step update
        # their moments/params (TF LazyAdamOptimizer semantics) — a dense
        # optax.adam would decay every row of a multi-million-row table
        # every step, which is exactly the full-table sweep this kernel
        # exists to avoid. Laziness is per LOGICAL row: under lane packing a
        # physical 128-lane row holds ``pack`` logical rows, so "touched" is
        # computed per dim-lane group (an untouched logical row sharing a
        # physical row with a touched one must keep its stale moments). The
        # group-any is a block-diagonal matmul: counts are small ints, exact
        # in bf16, accumulated f32 on the MXU.
        group_eq = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) // dim
                    == jax.lax.broadcasted_iota(jnp.int32, (L, L), 1) // dim)
        gmat = jnp.where(group_eq, jnp.float32(1),
                         jnp.float32(0)).astype(jnp.bfloat16)
        present = jnp.where(g != 0, jnp.float32(1),
                            jnp.float32(0)).astype(jnp.bfloat16)
        touched = jnp.dot(present, gmat,
                          preferred_element_type=jnp.float32) > 0
        m_new = jnp.float32(b1) * m_ref[:] + jnp.float32(1 - b1) * g
        v_new = jnp.float32(b2) * v_ref[:] + jnp.float32(1 - b2) * g * g
        update = lr * (m_new * bc1) / (jnp.sqrt(v_new * bc2) + jnp.float32(eps))
        m_out_ref[:] = jnp.where(touched, m_new, m_ref[:])
        v_out_ref[:] = jnp.where(touched, v_new, v_ref[:])
        param_out_ref[:] = jnp.where(touched, param_ref[:] - update,
                                     param_ref[:])


def fused_adam_apply(
    stack: jax.Array, m: jax.Array, v: jax.Array,
    lids: jax.Array, ct: jax.Array,
    *, pack: int, dim: int, lr, step,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
    tile_rows: int = 512, chunk: int = 1024, stream_dtype=jnp.float32,
    presorted=None, reorder: str = "auto", sites=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """In-place **lazy** Adam on a lane-packed stack.

    Logical rows with a nonzero aggregated gradient this step get the full
    Adam update with bias correction at time ``step + 1``; untouched rows
    keep stale moments (no full-table decay sweep — the point of the
    kernel). Laziness is at **logical-row** granularity: under lane packing
    each dim-lane group of a physical row is touched independently, matching
    per-row TF LazyAdam semantics. Matches ``fused_adam_ref`` (tests);
    diverges from dense ``optax.adam`` exactly on the untouched-row decay,
    as documented. Returns (new_stack, new_m, new_v); inputs are aliased
    (donated).
    """
    num_rows, L = stack.shape
    t = (jnp.asarray(step, jnp.float32) + 1.0)
    bc1 = 1.0 / (1.0 - jnp.power(jnp.float32(b1), t))
    bc2 = 1.0 / (1.0 - jnp.power(jnp.float32(b2), t))
    if L % 128 != 0 or num_rows % 64 != 0:
        return fused_adam_ref(stack, m, v, lids, ct, pack=pack, dim=dim,
                              lr=lr, step=step, b1=b1, b2=b2, eps=eps)
    return _run_fused_kernel(
        _fused_adam_kernel, [lr, bc1, bc2], stack, (m, v), lids, ct,
        pack=pack, dim=dim, tile_rows=tile_rows, chunk=chunk,
        stream_dtype=stream_dtype, presorted=presorted, reorder=reorder,
        extra_static={"b1": b1, "b2": b2, "eps": eps, "dim": dim},
        sites=sites)


def fused_adam_ref(stack, m, v, lids, ct, *, pack, dim, lr, step,
                   b1=0.9, b2=0.999, eps=1e-8):
    """XLA reference: lazy Adam on the dense scatter-added gradient.

    ``touched`` is per logical row (dim-lane group), not per physical
    lane-packed row — see ``fused_adam_apply``."""
    g = _dense_row_grad(stack, lids, ct, pack, dim)
    L = g.shape[1]
    lane_group = jnp.arange(L) // dim
    group_any = (g != 0).astype(jnp.float32) @ (
        lane_group[:, None] == lane_group[None, :]).astype(jnp.float32)
    touched = group_any > 0
    t = jnp.asarray(step, jnp.float32) + 1.0
    bc1 = 1.0 / (1.0 - jnp.power(jnp.float32(b1), t))
    bc2 = 1.0 / (1.0 - jnp.power(jnp.float32(b2), t))
    m_new = b1 * m + (1 - b1) * g
    v_new = b2 * v + (1 - b2) * g * g
    update = lr * (m_new * bc1) / (jnp.sqrt(v_new * bc2) + eps)
    return (jnp.where(touched, stack - update, stack),
            jnp.where(touched, m_new, m),
            jnp.where(touched, v_new, v))
