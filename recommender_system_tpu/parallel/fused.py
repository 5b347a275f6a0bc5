"""Sharded fused sparse optimizer + explicit all-to-all lookup (block layout).

Round-1's flagship perf path — the fused scatter-Adagrad/SGD/LazyAdam kernel
(``ops/fused_adagrad.py``) — was single-device: the Pallas kernel is opaque to
GSPMD, so under a mesh the row-sharded stacks would be all-gathered around it.
This module makes the kernel mesh-native by doing the partitioning *manually*
under ``jax.shard_map``:

- Embedding stacks keep their GSPMD layout: physical (wide, lane-packed) rows
  split **contiguously** over all mesh devices (``parallel.mesh
  table_sharding`` — shard ``s`` of ``n`` owns wide rows ``[s*K, (s+1)*K)``
  where ``K = rows / n``). Nothing about checkpoints, eval, or the plain
  GSPMD path changes.
- The sparse update stream ``(ids, cotangents)`` is split evenly over all
  devices; each device buckets its slice by owner shard, exchanges the
  buckets with ONE ``lax.all_to_all`` pair (ids + cotangents), and runs the
  existing fused kernel on its local stack slice. Updates for the same row
  arriving from several sources are pre-aggregated inside the kernel's
  sorted stream, so Adagrad/Adam "sum before square" semantics hold exactly.
- Buckets are **capacity-bounded** (static shapes — XLA requirement): each
  device accepts ``cap = ceil(capacity_factor * S / n)`` entries per source.
  Overflowing entries are *dropped from the update* and **counted**: every
  routed op returns an overflow scalar the Trainer surfaces in its history
  (silent gradient loss was round-1's known weakness). With hashed ids and
  equal-vocab stacked tables the per-destination counts concentrate hard
  around ``S/n``; raise ``capacity_factor`` (up to ``n``) for exactness.

``alltoall_take`` is the same routing for the FORWARD gather — the explicit
TPU-native embedding-lookup exchange (generalizing ``embedding_lookup``,
``/root/reference/algorithm/deep_learning/utils/inputs.py:59-89``) — used by
``layers.embedding.packed_take`` when the Trainer enables explicit-exchange
mode, and differentiable (the all_to_all transposes to an all_to_all and the
local gather to a scatter-add into the owning shard) for the dense-optimizer
mesh path.

Mod-sharded variants (standalone) live in ``parallel/embedding.py``; block
layout is used here because it is exactly GSPMD's ``P(('data','model'),
None)`` layout, so the same checkpoint/eval/serving code paths work with and
without the explicit exchange.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.embedding_grad import _SENTINEL


def _pad_stream(lids: jax.Array, ct: jax.Array, n: int):
    """Pad (ids, cotangents) to a multiple of n with sentinel ids / zero
    grads so the stream splits evenly over the mesh."""
    N = lids.shape[0]
    rem = (-N) % n
    if rem:
        lids = jnp.concatenate(
            [lids.astype(jnp.int32),
             jnp.full((rem,), _SENTINEL, jnp.int32)])
        ct = jnp.concatenate([ct, jnp.zeros((rem,) + ct.shape[1:], ct.dtype)])
    return lids.astype(jnp.int32), ct


def _mesh_axis_index(axis_names):
    """Linearized device index matching GSPMD's block order for
    ``P(axis_names, None)`` (row-major over the named axes)."""
    idx = jnp.int32(0)
    for name in axis_names:
        idx = idx * jax.lax.axis_size(name) + jax.lax.axis_index(name)
    return idx


def _route(owner: jax.Array, n: int, cap: int):
    """Owner-bucket a local stream: returns (order, sowner, slot, ok,
    overflow) where ``order`` sorts by owner, ``slot`` is the rank within the
    destination bucket (routed to column ``cap`` = dropped when over
    capacity or owner out of range)."""
    S = owner.shape[0]
    order = jnp.argsort(owner, stable=True)
    sowner = owner[order]
    bucket_start = jnp.searchsorted(sowner, jnp.arange(n)).astype(jnp.int32)
    pos = jnp.arange(S, dtype=jnp.int32) - bucket_start[
        jnp.clip(sowner, 0, n - 1)]
    valid = sowner < n
    ok = (pos < cap) & valid
    overflow = jnp.sum(~ok & valid, dtype=jnp.int32)
    slot = jnp.where(ok, pos, cap)
    return order, sowner, slot, ok, overflow


def _capacity(S: int, n: int, capacity_factor: float) -> int:
    cap = int(math.ceil(capacity_factor * S / n))
    return max(1, min(cap, S))


# ---------------------------------------------------------------------------
# Forward: explicit all-to-all gather over a block-sharded stack
# ---------------------------------------------------------------------------

def _take_body(stack_l, wids_l, *, n, K, cap, axes):
    me = _mesh_axis_index(axes)
    owner = (wids_l // K).astype(jnp.int32)  # pads (huge ids) -> owner >= n
    order, sowner, slot, ok, overflow = _route(owner, n, cap)
    swid = wids_l[order].astype(jnp.int32)
    send = jnp.zeros((n, cap), jnp.int32).at[sowner, slot].set(
        swid, mode="drop")
    recv = jax.lax.all_to_all(send, axes, 0, 0)               # [n, cap]
    local = recv.reshape(-1) - me * K
    served = jnp.take(stack_l, local, axis=0,
                      mode="fill", fill_value=0)               # [n*cap, L]
    back = jax.lax.all_to_all(served.reshape(n, cap, -1), axes, 0, 0)
    got = back[sowner, jnp.where(ok, slot, 0)]
    got = jnp.where(ok[:, None], got, jnp.zeros((), got.dtype))
    inv = jnp.argsort(order)
    return got[inv], overflow[None]


def alltoall_take(stack: jax.Array, wids: jax.Array, mesh: Mesh,
                  capacity_factor: float = 2.0
                  ) -> Tuple[jax.Array, jax.Array]:
    """Explicit-exchange gather of wide rows from a block-sharded stack.

    ``stack [R, L]`` laid out/sharded as ``P(mesh.axis_names, None)``,
    ``wids [N]`` wide-row ids -> ``([N, L], overflow_count)``. Overflowed
    ids (destination bucket over capacity) return ZERO rows and their count;
    differentiable wrt ``stack`` (overflowed gradients are dropped with the
    same accounting).
    """
    axes = mesh.axis_names
    n = mesh.devices.size
    R = stack.shape[0]
    if R % n != 0 or wids.shape[0] % n != 0:
        raise ValueError(f"block sharding needs n | rows and n | N "
                         f"(rows={R}, N={wids.shape[0]}, n={n})")
    K = R // n
    S = wids.shape[0] // n
    cap = _capacity(S, n, capacity_factor)
    fn = jax.shard_map(
        partial(_take_body, n=n, K=K, cap=cap, axes=axes),
        mesh=mesh,
        in_specs=(P(axes, None), P(axes)),
        out_specs=(P(axes, None), P(axes)),
        check_vma=False,  # the Pallas kernel body declares no vma
    )
    out, overflow = fn(stack, wids.astype(jnp.int32))
    return out, overflow.sum()


# ---------------------------------------------------------------------------
# Backward/update: route the cotangent stream, run the fused kernel per shard
# ---------------------------------------------------------------------------

def _update_body(stack_l, slots_l, lids_l, ct_l, lr, step, *, cfg, n, K,
                 pack, dim, cap, axes, stream_dtype):
    me = _mesh_axis_index(axes)
    owner = ((lids_l // pack) // K).astype(jnp.int32)  # pads -> owner >= n
    order, sowner, slot, ok, overflow = _route(owner, n, cap)
    slid = lids_l[order].astype(jnp.int32)
    sct = ct_l[order]
    send_ids = jnp.full((n, cap), _SENTINEL, jnp.int32).at[
        sowner, slot].set(slid, mode="drop")
    send_ct = jnp.zeros((n, cap, ct_l.shape[-1]), ct_l.dtype).at[
        sowner, slot].set(sct, mode="drop")
    recv_ids = jax.lax.all_to_all(send_ids, axes, 0, 0).reshape(-1)
    recv_ct = jax.lax.all_to_all(send_ct, axes, 0, 0).reshape(
        -1, ct_l.shape[-1])
    # sentinel ids stay >= K*pack after rebasing: the kernel's sorted-stream
    # queue never visits them (same padding contract as the single-chip path)
    local = recv_ids - me * K * pack
    # per-shard streams can recross the v5e gather cliff (~2^19 rows) at
    # small mesh sizes (stream/shard ~= capacity_factor * total / n, e.g. a
    # DIEN 8192-batch 827k-row stream at n=2): position-chunk the received
    # stream below the cliff exactly like the single-device multi-stream
    # queue (VERDICT r4 #3; ops/fused_adagrad.py split_oversize_sites)
    from ..ops.fused_adagrad import split_oversize_sites, stream_split_rows
    sites = None
    if local.shape[0] > stream_split_rows():
        sites = split_oversize_sites([(local, recv_ct, None)])
    new_stack, new_slots = cfg.apply(
        stack_l, slots_l, local, recv_ct, lr=lr, step=step, pack=pack,
        dim=dim, stream_dtype=stream_dtype, sites=sites)
    return new_stack, new_slots, overflow[None]


def sharded_fused_update(cfg, stack: jax.Array, slots, lids: jax.Array,
                         ct: jax.Array, mesh: Mesh, *, lr, step, pack: int,
                         dim: int, stream_dtype=jnp.float32,
                         capacity_factor: float = 2.0):
    """Apply one fused sparse-optimizer step on a mesh-sharded stack.

    ``cfg``: a FusedAdagrad / FusedSGD / FusedAdam config
    (``training.harness``). ``stack [R, L]`` + per-row ``slots`` sharded
    ``P(mesh.axis_names, None)``; ``lids [N]`` logical row ids and
    ``ct [N, dim]`` cotangents (any sharding — resharded to an even split).
    Returns ``(new_stack, new_slots, overflow_count)``. Semantics match the
    single-device fused kernel exactly for every id under capacity;
    over-capacity updates are dropped and counted.
    """
    axes = mesh.axis_names
    n = mesh.devices.size
    R = stack.shape[0]
    if R % n != 0:
        raise ValueError(
            f"stack rows {R} not divisible by mesh size {n}; stacks are "
            f"rounded to 512-row multiples — use a power-of-two mesh <= 512")
    K = R // n
    lids, ct = _pad_stream(lids, ct, n)
    S = lids.shape[0] // n
    cap = _capacity(S, n, capacity_factor)
    slot_specs = jax.tree.map(lambda _: P(axes, None), slots)
    fn = jax.shard_map(
        partial(_update_body, cfg=cfg, n=n, K=K, pack=pack, dim=dim,
                cap=cap, axes=axes, stream_dtype=stream_dtype),
        mesh=mesh,
        in_specs=(P(axes, None), slot_specs, P(axes), P(axes, None),
                  P(), P()),
        out_specs=(P(axes, None), slot_specs, P(axes)),
        check_vma=False,  # the Pallas kernel body declares no vma
    )
    new_stack, new_slots, overflow = fn(
        stack, slots, lids, ct, jnp.asarray(lr, jnp.float32),
        jnp.asarray(step, jnp.int32))
    return new_stack, new_slots, overflow.sum()
