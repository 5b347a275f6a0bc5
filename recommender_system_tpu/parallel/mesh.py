"""Device mesh + sharding rules: the pjit/GSPMD foundation.

The reference is strictly single-process (``utils/compile_fit.py:9-15``; SURVEY.md
§2.4: no tf.distribute/NCCL/MPI anywhere). This module is new design surface:

- ``make_mesh(data, model)`` — a 2-axis ``jax.sharding.Mesh`` ('data' for batch /
  DP, 'model' for table row-sharding / EP).
- ``embedding_sharding_rules`` — embedding stacks (``table_d*``) are row-sharded
  across *all* mesh devices (a hashed id is equally likely to live anywhere, and
  rows are fetched by id, so sharding rows over data x model both balances memory
  and parallelizes the gather); dense tower params are replicated and their grads
  psum over 'data' (inserted automatically by GSPMD).
- ``shard_batch`` / ``shard_state`` — placement helpers.

XLA compiles the resulting collectives onto ICI; the explicit shard_map
all-to-all path lives in ``parallel/embedding.py``.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. ``data=None`` uses all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, (data, model, n)
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis split over 'data' (leading dim)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Embedding stack rows split over every device (data x model)."""
    return NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), None))


# Wide-row stacks (dim >= 64: at most 2 logical rows per 128-lane physical
# row) are additionally COLUMN-sharded: rows over 'data', lanes over 'model'
# (north star: "row/column-sharded tables"). A narrow stack (pack >= 4)
# gains nothing from splitting 128 lanes, but a wide table's row fragments
# parallelize the gather bandwidth across the model axis.
COLUMN_SHARD_MIN_DIM = 64


def wide_table_sharding(mesh: Mesh) -> NamedSharding:
    """2-D sharding for wide-row stacks: P('data', 'model')."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def _table_dim_from_path(path) -> Optional[int]:
    for entry in path:
        key = getattr(entry, "key", None)
        if isinstance(key, tuple):
            key = key[-1] if key else None
        if isinstance(key, str) and key.startswith("table_d"):
            try:
                return int(key[len("table_d"):])
            except ValueError:
                return None
    return None


def is_embedding_table_path(path) -> bool:
    """True if a pytree key-path addresses a fused embedding stack param
    (or its fused-optimizer slot state, whose dict keys are flattened path
    TUPLES like ``('unified', 'embeddings', 'table_d9')``)."""
    for entry in path:
        key = getattr(entry, "key", None)
        if isinstance(key, tuple):
            key = key[-1] if key else None
        if isinstance(key, str) and key.startswith("table_d"):
            return True
    return False


def is_expert_path(path) -> bool:
    """True for MMoE expert tensors ([D, H, E] — EP shards the expert axis)."""
    key = getattr(path[-1], "key", None) if path else None
    return isinstance(key, str) and key in ("experts", "expert_bias")


def expert_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Expert parallelism: last (expert) axis split over 'model'."""
    spec = [None] * (ndim - 1) + [MODEL_AXIS]
    return NamedSharding(mesh, P(*spec))


def _rule(path, leaf, mesh: Mesh, column_sharding: bool = True):
    if is_embedding_table_path(path) and getattr(leaf, "ndim", 0) == 2:
        dim = _table_dim_from_path(path)
        n_model = mesh.shape[MODEL_AXIS]
        if (column_sharding
                and dim is not None and dim >= COLUMN_SHARD_MIN_DIM
                and n_model > 1
                and leaf.shape[0] % mesh.shape[DATA_AXIS] == 0
                and leaf.shape[1] % n_model == 0):
            return wide_table_sharding(mesh)
        return table_sharding(mesh)
    if (is_expert_path(path) and getattr(leaf, "ndim", 0) >= 2
            and mesh.shape[MODEL_AXIS] > 1):
        return expert_sharding(mesh, leaf.ndim)
    return replicated(mesh)


def param_shardings(params, mesh: Mesh, column_sharding: bool = True):
    """NamedSharding pytree: table stacks row-sharded, MMoE experts
    expert-sharded over 'model', everything else replicated.

    ``column_sharding=False`` forces 1-D row sharding (``P(axes, None)``)
    for every stack regardless of width. The explicit shard_map paths
    (``parallel.fused.alltoall_take`` / ``sharded_fused_update``) hard-assume
    the 1-D block layout; leaving a wide stack on ``P('data','model')`` there
    would make shard_map silently reshard it every step (VERDICT r2 #7), so
    the Trainer passes False whenever those paths are active."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _rule(path, leaf, mesh, column_sharding), params)


def shard_batch(batch, mesh: Mesh):
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_state(state, mesh: Mesh, column_sharding: bool = True):
    """Place a TrainState: params/opt_state by param rules, scalars replicated."""
    shardings = state_shardings(state, mesh, column_sharding)
    return jax.tree.map(jax.device_put, state, shardings)


def state_shardings(state, mesh: Mesh, column_sharding: bool = True):
    """Sharding pytree matching a TrainState (opt_state mirrors params rules).
    ``column_sharding`` as in :func:`param_shardings`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _rule(path, leaf, mesh, column_sharding), state)
