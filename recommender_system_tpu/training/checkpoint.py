"""Checkpoint / resume via orbax: sharded pytrees saved per-host.

The reference has no persistence at all (no ``save``/``ModelCheckpoint``; the
FNN two-stage handoff happens in-process via ``model.variables[2]``,
``model/fnn.py:51-54``). Here any TrainState pytree — including row-sharded
embedding stacks — round-trips through orbax, which writes each host's shards
locally on multi-host meshes.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, step: Optional[int] = None) -> str:
    """Save a pytree (e.g. TrainState) under ``path/step``; returns the dir."""
    path = os.path.abspath(path)
    target = os.path.join(path, str(int(step if step is not None
                                        else jax.device_get(state.step))))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(target, state, force=True)
    ckptr.wait_until_finished()
    return target

def latest_step(path: str) -> Optional[int]:
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    steps = [int(d) for d in os.listdir(path) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(path: str, target_state: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure of ``target_state`` (an abstract/init state)."""
    path = os.path.abspath(path)
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(path, str(step)), target_state)
