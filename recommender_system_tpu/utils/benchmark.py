"""Trustworthy TPU timing: differential, fetch-forced measurement.

Through the axon tunnel ``jax.block_until_ready`` returns before the device
actually finishes (measured impossibilities: 22,321 "TFLOP/s" fp32, 11 "TB/s"
HBM). The only reliable completion barrier is a **value fetch** (device->host
transfer of real bytes). Protocol used by every benchmark here:

1. warm up (compile + caches),
2. run ``n1`` iterations, fetch a scalar derived from the result,
3. run ``n2 > n1`` iterations, fetch again,
4. per-iteration time = (t2 - t1) / (n2 - n1) — the fetch/tunnel overhead and
   dispatch tail cancel out.

Device-side execution is in-order, so fetching the last result forces all
enqueued work. Sanity-checked against v5e peaks: 160 TFLOP/s fp32(bf16x1) /
181 TFLOP/s bf16 on 8192^3 matmuls (peak 197).
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


def _force(result) -> float:
    """Fetch real bytes from (the first array leaf of) a result pytree."""
    leaf = jax.tree_util.tree_leaves(result)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:8]).astype(jnp.float32))


def time_iterations(run_n: Callable[[int], object], n1: int, n2: int) -> float:
    """Differential timing: run_n(n) must run n chained iterations and return
    something fetchable. Returns seconds per iteration."""
    _force(run_n(max(n1 // 2, 1)))  # warmup — fetch so nothing bleeds into t0
    t0 = time.perf_counter()
    _force(run_n(n1))
    t1 = time.perf_counter()
    _force(run_n(n2))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def bench_fn(f: Callable, *args, n1: int = 10, n2: int = 40) -> float:
    """Seconds per call of jitted ``f(*args)`` (calls enqueue back-to-back;
    in-order execution makes the final fetch force them all)."""

    def run_n(n):
        r = None
        for _ in range(n):
            r = f(*args)
        return r

    return time_iterations(run_n, n1, n2)


def bench_train_step(step: Callable, state, batch, labels,
                     n1: int = 5, n2: int = 25):
    """(seconds per step, final state) for a donated train step — iterations
    chain through the state so they serialize on-device by construction."""
    holder = {"state": state}

    def run_n(n):
        s = holder["state"]
        loss = None
        for _ in range(n):
            s, loss = step(s, batch, labels)
        holder["state"] = s
        return loss

    sec = time_iterations(run_n, n1, n2)
    return sec, holder["state"]
