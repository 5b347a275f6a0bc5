"""Sharded sparse embedding lookup: explicit all-to-all ID exchange + local gather.

The TPU-native replacement for parameter-server embedding lookups (generalizing
``create_embedding_dict``/``embedding_lookup``, ``utils/inputs.py:22-89``, to
row-sharded multi-chip tables — SURVEY.md §5.8):

Tables are **mod-sharded**: global row ``r`` lives on shard ``r % n`` at local row
``r // n`` (hashed ids are uniform, so buckets balance). Lookup under
``shard_map``:

1. bucket this shard's ids by owner (stable argsort — static shapes),
2. ``lax.all_to_all`` the id buckets (capacity-bounded: ``cap = ceil(cf * B / n)``;
   overflow ids fall back to the padding row, see ``capacity_factor``),
3. local gather from the shard's table slice,
4. ``lax.all_to_all`` the embedding rows back and undo the permutation.

Everything is static-shape and differentiable (all_to_all transposes to
all_to_all; the gather transposes to scatter-add into the local shard, which is
exactly the fused sparse-optimizer update path).

Also provides ``mod_shard_table`` / ``unshard_table`` host utilities and a
GSPMD fallback (plain ``jnp.take`` on a NamedSharding-annotated table) — golden
tests assert both equal the unsharded gather.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mod_shard_table(table: np.ndarray, num_shards: int) -> np.ndarray:
    """[V, d] -> [num_shards, ceil(V/n), d] with row r at [r % n, r // n]."""
    V, d = table.shape
    rows_per = math.ceil(V / num_shards)
    out = np.zeros((num_shards, rows_per, d), table.dtype)
    for s in range(num_shards):
        rows = np.arange(s, V, num_shards)
        out[s, : len(rows)] = table[rows]
    return out


def unshard_table(sharded: np.ndarray, vocab: int) -> np.ndarray:
    """Inverse of ``mod_shard_table``."""
    n, rows_per, d = sharded.shape
    out = np.zeros((vocab, d), sharded.dtype)
    for s in range(n):
        rows = np.arange(s, vocab, n)
        out[rows] = sharded[s, : len(rows)]
    return out


def alltoall_lookup(table_shard: jax.Array, ids: jax.Array, axis_name: str,
                    capacity_factor: float = 2.0) -> jax.Array:
    """Per-shard body (call under ``shard_map``): embed ``ids [B]`` from a
    mod-sharded table (this shard holds ``table_shard [rows_per, d]``).

    Returns ``[B, d]``. Ids overflowing a destination's capacity resolve to
    **zero vectors** (and their gradients are dropped) — with hashed ids and
    ``capacity_factor >= 2`` this is vanishingly rare; raise it (up to ``n``)
    for exactness. Zero (rather than some trained row) keeps overflow from
    aliasing onto a real embedding.
    """
    n = jax.lax.axis_size(axis_name)
    B = ids.shape[0]
    cap = int(math.ceil(capacity_factor * B / n))
    cap = min(cap, B) if B >= n else B

    owner = (ids % n).astype(jnp.int32)
    order = jnp.argsort(owner, stable=True)
    sorted_ids = ids[order]
    sorted_owner = owner[order]
    bucket_start = jnp.searchsorted(sorted_owner, jnp.arange(n))
    pos = jnp.arange(B) - bucket_start[sorted_owner]  # rank within bucket
    in_cap = pos < cap

    # send buffer of *global* ids, sentinel 0 (padding row) elsewhere.
    # Overflow entries are routed to column index ``cap`` (out of bounds) so
    # mode="drop" discards them instead of clobbering slot 0.
    send = jnp.zeros((n, cap), jnp.int32)
    send = send.at[sorted_owner, jnp.where(in_cap, pos, cap)].set(
        sorted_ids.astype(jnp.int32), mode="drop")

    recv = jax.lax.all_to_all(send, axis_name, 0, 0)          # [n, cap]
    local_rows = recv // n                                     # my local index
    served = jnp.take(table_shard, local_rows.reshape(-1), axis=0,
                      fill_value=0).reshape(n, cap, -1)
    back = jax.lax.all_to_all(served, axis_name, 0, 0)         # [n, cap, d]

    emb_sorted = back[sorted_owner, jnp.where(in_cap, pos, 0)]
    emb_sorted = jnp.where(in_cap[:, None], emb_sorted,
                           jnp.zeros_like(emb_sorted))
    inv = jnp.argsort(order)
    return emb_sorted[inv]


def sharded_lookup(table_sharded: jax.Array, ids: jax.Array, mesh: Mesh,
                   capacity_factor: float = 2.0) -> jax.Array:
    """Driver: ``table_sharded [n, rows_per, d]`` (mod-sharded), ``ids [B_global]``
    -> ``[B_global, d]`` via shard_map over the flattened mesh."""
    axes = mesh.axis_names

    def body(table_block, ids_block):
        # shard_map keeps the sharded leading dim (size 1 per shard) — drop it.
        return alltoall_lookup(table_block[0], ids_block, axis_name=axes,
                               capacity_factor=capacity_factor)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axes, None, None), P(axes)),
        out_specs=P(axes, None),
    )
    return fn(table_sharded, ids)


@jax.jit
def _take_rows(t, i):
    return jnp.take(t, i, axis=0)


def gspmd_lookup(table: jax.Array, ids: jax.Array, mesh: Mesh) -> jax.Array:
    """GSPMD baseline: row-sharded table + data-sharded ids, plain ``take`` —
    the SPMD partitioner inserts the gather collectives automatically."""
    axes = mesh.axis_names
    table = jax.device_put(table, NamedSharding(mesh, P(axes, None)))
    ids = jax.device_put(ids, NamedSharding(mesh, P(axes)))
    return _take_rows(table, ids)
