"""Fused adagrad kernel on real TPU: correctness vs XLA ref + timing."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from recommender_system_tpu.ops.fused_adagrad import (fused_adagrad_apply,
                                                      fused_adagrad_ref)

ROWS = 185856  # 363 * 512
PACK, DIM = 14, 9
N = 212992


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.normal(size=(ROWS, 128)).astype(np.float32))
    acc = jnp.full((ROWS, 128), 0.1, jnp.float32)
    lids = jnp.asarray(rng.integers(0, ROWS * PACK, size=N, dtype=np.int32))
    ct = jnp.asarray(rng.normal(size=(N, DIM)).astype(np.float32))

    # correctness on-chip (small slice comparison to avoid tunnel transfer)
    f = jax.jit(lambda s, a, i, c: fused_adagrad_apply(
        s, a, i, c, pack=PACK, dim=DIM, lr=0.05))
    ns, na = f(stack, acc, lids, ct)
    rs, ra = jax.jit(lambda s, a, i, c: fused_adagrad_ref(
        s, a, i, c, pack=PACK, dim=DIM, lr=0.05))(stack, acc, lids, ct)
    ds = float(jnp.max(jnp.abs(ns - rs)))
    da = float(jnp.max(jnp.abs(na - ra)))
    rel = float(jnp.max(jnp.abs(ns - rs) / (jnp.abs(rs) + 1e-3)))
    print(f"max|stack diff|={ds:.2e} rel={rel:.2e} max|acc diff|={da:.2e}")

    for tile, chunk, sd in ((512, 1024, jnp.float32), (256, 512, jnp.float32),
                            (512, 512, jnp.float32), (256, 1024, jnp.float32),
                            (512, 1024, jnp.bfloat16), (256, 512, jnp.bfloat16),
                            (128, 512, jnp.float32), (256, 256, jnp.float32)):
        g = jax.jit(lambda s, a, i, c, t=tile, ck=chunk, d=sd: jax.tree.map(
            jnp.sum, fused_adagrad_apply(
                s, a, i, c, pack=PACK, dim=DIM, lr=0.05,
                tile_rows=t, chunk=ck, stream_dtype=d)))
        try:
            t = timeit(g, stack, acc, lids, ct)
            print(f"fused tile={tile:4d} chunk={chunk:5d} {sd.__name__:8s}: "
                  f"{t*1e3:8.3f} ms")
        except Exception as e:
            print(f"fused tile={tile} chunk={chunk} {sd.__name__}: "
                  f"FAILED {type(e).__name__}: {str(e)[:200]}")

    gref = jax.jit(lambda s, a, i, c: jax.tree.map(jnp.sum, fused_adagrad_ref(
        s, a, i, c, pack=PACK, dim=DIM, lr=0.05)))
    print(f"XLA ref (scatter+adagrad):  {timeit(gref, stack, acc, lids, ct)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
