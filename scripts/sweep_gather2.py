"""Is the row gather DMA-issue-rate bound? N-scaling + multi-queue Pallas test."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIDE = 185728


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / n


def pallas_gather(stack, ids, *, queues=8, rows_per_step=8):
    """Gather stack[ids] via a Pallas kernel with `queues` parallel row DMAs.

    Grid over id blocks; each step issues `queues` async row copies
    HBM->out(VMEM block), waits all. Ids come in via scalar prefetch.
    """
    N = ids.shape[0]
    block = queues * rows_per_step  # rows per grid step
    assert N % block == 0
    grid = N // block

    def kernel(ids_ref, hbm_ref, out_ref, sems):
        w = pl.program_id(0)
        base = w * block
        for q in range(queues):
            for r in range(rows_per_step):
                k = q * rows_per_step + r
                row = ids_ref[base + k]
                pltpu.make_async_copy(
                    hbm_ref.at[row], out_ref.at[k], sems.at[q, r]).start()
        for q in range(queues):
            for r in range(rows_per_step):
                k = q * rows_per_step + r
                row = ids_ref[base + k]
                pltpu.make_async_copy(
                    hbm_ref.at[row], out_ref.at[k], sems.at[q, r]).wait()

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((block, 128), lambda w, ids: (w, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((N, 128), stack.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((queues, rows_per_step))],
    )(ids, stack)


def main():
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.normal(size=(WIDE, 128)).astype(np.float32))

    f = jax.jit(lambda s, i: jnp.take(s, i, axis=0).sum())
    for N in (13312, 53248, 212992, 851968):
        ids = jnp.asarray(rng.integers(0, WIDE, size=N, dtype=np.int32))
        t = timeit(f, stack, ids)
        print(f"XLA gather N={N:7d}: {t*1e3:8.3f} ms  ({t/N*1e9:6.2f} ns/row)")

    N = 212992
    const = jnp.full((N,), 777, jnp.int32)
    t = timeit(f, stack, const)
    print(f"XLA gather constant ids : {t*1e3:8.3f} ms ({t/N*1e9:6.2f} ns/row)")

    seq = jnp.arange(N, dtype=jnp.int32) % WIDE
    t = timeit(f, stack, seq)
    print(f"XLA gather sequential   : {t*1e3:8.3f} ms ({t/N*1e9:6.2f} ns/row)")

    ids = jnp.asarray(rng.integers(0, WIDE, size=N, dtype=np.int32))
    for queues, rps in ((4, 4), (8, 4), (8, 8), (16, 8)):
        try:
            g = jax.jit(functools.partial(
                pallas_gather, queues=queues, rows_per_step=rps))
            gf = jax.jit(lambda s, i, g=g: g(s, i).sum())
            t = timeit(gf, stack, ids)
            print(f"Pallas gather q={queues:2d} r={rps}: {t*1e3:8.3f} ms "
                  f"({t/N*1e9:6.2f} ns/row)")
        except Exception as e:
            print(f"Pallas gather q={queues} r={rps}: FAILED {type(e).__name__}: {e}"[:300])

    # batched per-feature sort vs flat sort
    lid = jnp.asarray(rng.integers(0, 100_000, size=(26, 8192), dtype=np.int32))
    fs_flat = jax.jit(lambda i: jax.lax.sort(
        [i.reshape(-1), jnp.arange(26 * 8192, dtype=jnp.int32)],
        num_keys=1)[0].sum())
    fs_bat = jax.jit(lambda i: jax.lax.sort(
        [i, jnp.broadcast_to(jnp.arange(8192, dtype=jnp.int32), (26, 8192))],
        dimension=1, num_keys=1)[0].sum())
    print(f"flat sort 213k:          {timeit(fs_flat, lid)*1e3:8.3f} ms")
    print(f"batched sort 26x8192:    {timeit(fs_bat, lid)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
