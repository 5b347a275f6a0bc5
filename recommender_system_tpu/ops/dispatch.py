"""Kernel dispatch: Pallas vs XLA per op.

Every hot op has a pure-jax reference implementation (ground truth for tests
and the backward pass) and a fused Pallas TPU kernel. Dispatch policy is
**measurement-driven**, re-confirmed at the current bench configs (TPU v5e,
**2026-08-21**, batch 16384, `benchmarks/interaction_dispatch.py`, fetch-
forced differential timing per ``utils/benchmark.py``): XLA's own fusion
beats the hand interaction kernels on every op —

- FM fwd+bwd: XLA ~0.11 ms vs Pallas ~0.63 ms (fwd both < the ~0.2 ms
  protocol resolution),
- DCN cross (6 layers) fwd+bwd: XLA ~0.76 ms vs Pallas ~1.11 ms,
- DIN attention (T=50, K=32) fwd: XLA f32 1.10 ms / XLA bf16 scorer
  1.07 ms vs **Pallas 4.49 ms** — the DIN kernel is ~4x slower and is
  DEMOTED: kept only as a correctness cross-check and an example of the
  fused-scorer layout; never dispatch it in production.

So the default is the XLA path; the Pallas interaction kernels are opt-in
(``RST_FORCE_PALLAS=1`` or a per-module ``use_pallas=True``). Hand kernels
pay off where XLA *cannot* fuse — the fused sparse optimizers
(``ops/fused_adagrad.py``), the work-queue scatter (``ops/embedding_grad``),
and the sharded embedding exchange (``parallel/fused.py``) — which dispatch
unconditionally to their custom implementations.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_TPU_BACKENDS = ("tpu", "axon")


def on_tpu() -> bool:
    try:
        return jax.default_backend().lower() in _TPU_BACKENDS or (
            jax.devices()[0].platform.lower() in _TPU_BACKENDS)
    except Exception:
        return False


def use_pallas(override: Optional[bool] = None) -> bool:
    if override is not None:
        return override
    if os.environ.get("RST_DISABLE_PALLAS") == "1":
        return False
    if os.environ.get("RST_FORCE_PALLAS") == "1":
        return True
    return False  # XLA wins on the interaction ops (see module docstring)


def interpret_mode() -> bool:
    """Pallas interpret=True when not on real TPU (CPU tests)."""
    return not on_tpu()


# --- fast embedding backward (work-queue scatter kernel) -------------------
# The kernel is a pallas_call, which GSPMD treats as opaque: under a mesh the
# row-sharded stacks would be all-gathered around it. The Trainer/parallel
# helpers flip mesh mode so sharded runs keep XLA's partitionable scatter,
# while single-device TPU runs get the kernel. Trace-time global (models are
# traced under jit once per Trainer).
_mesh_mode = False


def set_mesh_mode(active: bool) -> None:
    global _mesh_mode
    _mesh_mode = bool(active)


def mesh_mode() -> bool:
    return _mesh_mode


# --- fused sparse optimizer (perturb-hook cotangent capture) ---------------
# When on, EmbeddingCollection adds flax perturb/sow hooks at every lookup so
# the Trainer can route embedding cotangents straight into the fused Adagrad
# scatter kernel (ops/fused_adagrad.py) — no dense stack gradient exists.
# Trace-time global, same discipline as mesh mode.
_fused_opt = False


def set_fused_opt_mode(active: bool) -> None:
    global _fused_opt
    _fused_opt = bool(active)


def fused_opt_mode() -> bool:
    return _fused_opt


# --- explicit all-to-all embedding lookup (mesh mode) -----------------------
# When a mesh is registered here, EmbeddingCollection routes its forward
# gathers through the explicit shard_map exchange (parallel/fused.py
# alltoall_take) instead of GSPMD's synthesized gather. Trace-time global,
# set by the Trainer (explicit_lookup=True).
_lookup_mesh = None
_lookup_capacity = 2.0


def set_lookup_mesh(mesh, capacity_factor: float = 2.0) -> None:
    global _lookup_mesh, _lookup_capacity
    _lookup_mesh = mesh
    _lookup_capacity = float(capacity_factor)


def lookup_mesh():
    return _lookup_mesh


def lookup_capacity() -> float:
    return _lookup_capacity


def fast_scatter(override: Optional[bool] = None) -> bool:
    """Use the Pallas work-queue scatter as the embedding-lookup backward."""
    if override is not None:
        return override
    env = os.environ.get("RST_FAST_SCATTER")
    if env is not None:
        return env == "1"
    return on_tpu() and not _mesh_mode
