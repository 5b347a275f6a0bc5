"""Re-profile the interaction-op dispatch choice (XLA vs Pallas kernels) at
the current bench configs — the evidence behind ``ops/dispatch.py``'s
default-to-XLA policy (VERDICT r3 #5 asked for a dated re-measurement at the
bf16-era configs; the previous numbers were f32, 2026-08-17).

Ops and shapes:
- fm_fused        vs XLA ref: x [B, 221], v [221, 8]        (DeepFM-ish)
- cross_fused     vs XLA ref: x0 [B, 221], 6 layers         (DCN bench)
- din_attention   Pallas vs XLA f32 vs XLA bf16 scorer:
                  q [B, 32], keys [B, 50, 32]               (DIN bench)

Forward and forward+backward (the fused kernels' VJPs fall back to the XLA
ref, so backward deltas isolate the forward dispatch).

Usage: python -m benchmarks.interaction_dispatch [--batch 16384]
"""
import argparse

import numpy as np

import jax
import jax.numpy as jnp

from recommender_system_tpu.utils.benchmark import bench_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    args = ap.parse_args()
    B = args.batch
    rng = np.random.default_rng(0)

    from recommender_system_tpu.ops.attention import din_attention
    from recommender_system_tpu.ops.pallas_kernels import (cross_fused,
                                                          fm_fused)
    from recommender_system_tpu.ops.pallas_kernels import (_cross_ref,
                                                          _fm_ref)

    D, k = 221, 8
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(D, 1)).astype(np.float32) * 0.01)
    v = jnp.asarray(rng.normal(size=(D, k)).astype(np.float32) * 0.01)

    print(f"batch {B}")
    for name, f in (("fm XLA", _fm_ref), ("fm Pallas", fm_fused)):
        t = bench_fn(jax.jit(f), x, w1, v)
        g = jax.jit(jax.grad(lambda *a: jnp.sum(f(*a)), argnums=(0, 1, 2)))
        tb = bench_fn(g, x, w1, v)
        print(f"  {name:24s}: fwd {t*1e6:7.0f} us   fwd+bwd {tb*1e6:7.0f} us")

    L = 6
    ws = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.01)
    bs = jnp.asarray(np.zeros((L, D), np.float32))
    for name, f in (("cross XLA", _cross_ref), ("cross Pallas", cross_fused)):
        t = bench_fn(jax.jit(f), x, ws, bs)
        g = jax.jit(jax.grad(lambda *a: jnp.sum(f(*a)), argnums=(0, 1, 2)))
        tb = bench_fn(g, x, ws, bs)
        print(f"  {name:24s}: fwd {t*1e6:7.0f} us   fwd+bwd {tb*1e6:7.0f} us")

    T, K = 50, 32
    q = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(B, T, K)).astype(np.float32))
    mask = jnp.asarray(
        np.arange(T)[None, :] < rng.integers(5, T + 1, size=B)[:, None])
    h1, h2 = 80, 40
    aw1 = jnp.asarray(rng.normal(size=(4 * K, h1)).astype(np.float32) * 0.05)
    ab1 = jnp.zeros((h1,))
    aw2 = jnp.asarray(rng.normal(size=(h1, h2)).astype(np.float32) * 0.05)
    ab2 = jnp.zeros((h2,))
    aw3 = jnp.asarray(rng.normal(size=(h2, 1)).astype(np.float32) * 0.05)
    ab3 = jnp.zeros((1,))

    cases = (
        ("din XLA f32", dict(use_pallas=False, dtype=None, remat=False)),
        ("din XLA f32 remat", dict(use_pallas=False, dtype=None, remat=True)),
        ("din XLA bf16 scorer",
         dict(use_pallas=False, dtype=jnp.bfloat16, remat=False)),
        ("din XLA bf16 remat",
         dict(use_pallas=False, dtype=jnp.bfloat16, remat=True)),
        ("din Pallas", dict(use_pallas=True, dtype=None)),
    )
    for name, kw in cases:
        def f(q, keys, aw1, aw2, aw3, kw=kw):
            return din_attention(q, keys, mask, aw1, ab1, aw2, ab2, aw3, ab3,
                                 **kw)
        t = bench_fn(jax.jit(f), q, keys, aw1, aw2, aw3)
        g = jax.jit(jax.grad(
            lambda *a: jnp.sum(f(*a)), argnums=(0, 1, 2, 3, 4)))
        tb = bench_fn(g, q, keys, aw1, aw2, aw3)
        print(f"  {name:24s}: fwd {t*1e6:7.0f} us   fwd+bwd {tb*1e6:7.0f} us")


if __name__ == "__main__":
    main()
