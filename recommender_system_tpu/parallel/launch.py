"""Multi-host launch: jax.distributed initialization + pod-slice meshes.

The single-chip tunnel in this environment cannot exercise multi-host runs;
this module provides the (standard, untestable-here) launch path so a real
pod slice works out of the box, and documents the design:

- every host runs the same program; ``initialize()`` wires jax.distributed
  (coordinator = process 0) so ``jax.devices()`` sees the global device set,
- ``make_pod_mesh`` lays the 'data' axis across hosts (DCN-friendly: batch
  collectives stay host-local or ride cheap all-reduces) and 'model' within
  a host's chips (ICI) so the embedding all-to-all and expert collectives
  ride the fast interconnect — the layout rule from the scaling playbook,
- per-host data loading: each process feeds only its batch shard
  (``host_batch_slice``); ``jax.make_array_from_process_local_data``
  assembles the global batch.

Checkpointing (orbax, ``training/checkpoint.py``) already writes per-host
shards for sharded arrays.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Wire up jax.distributed (no-op if single-process or already done).

    With TPU metadata available (GCE/GKE pods) all arguments are discovered
    automatically; otherwise pass them explicitly.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        # single-process run (e.g. this environment's one-chip tunnel)
        pass


def make_pod_mesh(model_per_host: int = 1) -> Mesh:
    """('data', 'model') mesh over all global devices: 'model' spans
    ``model_per_host`` chips within each host (ICI-local collectives for the
    embedding all-to-all / expert exchange), 'data' spans the rest."""
    devices = np.asarray(jax.devices())
    n = len(devices)
    assert n % model_per_host == 0, (n, model_per_host)
    return Mesh(devices.reshape(n // model_per_host, model_per_host),
                (DATA_AXIS, MODEL_AXIS))


def host_batch_slice(global_batch: int) -> slice:
    """The row range of the global batch this host should load."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def global_batch_from_local(local_batch, mesh: Mesh):
    """Assemble a global data-sharded batch from per-host local arrays."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch)
