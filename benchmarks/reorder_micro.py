"""Microbenchmark the fused-optimizer cotangent-reorder gather at the DeepFM
(427k rows) and DIEN (836k rows) stream sizes.

Round-3 trace finding: the DIEN fused step's single biggest op is the wide
bf16 [836608, 128] reorder gather at ~9 ms (~10.8 ns/row) — 3.6x the 3 ns/row
this same layout measures at DeepFM's 427k rows. This isolates: rows x dtype
x (wide gather | narrow gather + lane-shift).

Usage: python -m benchmarks.reorder_micro
"""
import numpy as np

import jax
import jax.numpy as jnp

from recommender_system_tpu.ops.fused_adagrad import _lane_shift_matmul
from recommender_system_tpu.utils.benchmark import bench_fn


def _chunked_take(src, order, k):
    """Gather split into k sequential index-chunks (same source array)."""
    parts = jnp.split(order, k)
    return jnp.concatenate([jnp.take(src, p, axis=0) for p in parts], axis=0)


def main():
    rng = np.random.default_rng(0)
    for N in (417_792, 524_288, 626_688, 835_584):
        order = jnp.asarray(rng.permutation(N).astype(np.int32))
        ct32 = jnp.asarray(rng.normal(size=(N, 32)).astype(np.float32))
        slots = jnp.asarray(rng.integers(0, 4, size=N).astype(np.int32))

        wide_bf16 = _lane_shift_matmul(ct32, slots, 4, 32, jnp.bfloat16)
        wide_f32 = _lane_shift_matmul(ct32, slots, 4, 32, jnp.float32)
        ct16 = ct32.astype(jnp.bfloat16)

        cases = {
            "wide bf16 [N,128] gather": (lambda s, o: jnp.take(s, o, axis=0),
                                         wide_bf16, order),
            "wide f32  [N,128] gather": (lambda s, o: jnp.take(s, o, axis=0),
                                         wide_f32, order),
            "narrow f32 [N,32] gather": (lambda s, o: jnp.take(s, o, axis=0),
                                         ct32, order),
            "narrow bf16 [N,32] gather": (lambda s, o: jnp.take(s, o, axis=0),
                                          ct16, order),
            "narrow f32 gather+shift(bf16)": (
                lambda s, o: _lane_shift_matmul(
                    jnp.take(s, o, axis=0), slots[o], 4, 32, jnp.bfloat16),
                ct32, order),
            "wide bf16 chunked x2 gather": (
                lambda s, o: _chunked_take(s, o, 2), wide_bf16, order),
            "wide bf16 chunked x4 gather": (
                lambda s, o: _chunked_take(s, o, 4), wide_bf16, order),
        }
        print(f"N = {N}")
        for name, (fn, src, o) in cases.items():
            f = jax.jit(fn)
            t = bench_fn(f, src, o)
            print(f"  {name:34s}: {t*1e3:7.3f} ms  "
                  f"({t/ N * 1e9:5.2f} ns/row)")


if __name__ == "__main__":
    main()
