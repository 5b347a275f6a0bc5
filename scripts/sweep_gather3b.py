"""Isolate why the model-param gather is 2x slower than the fresh-array gather."""
import time

import numpy as np
import jax
import jax.numpy as jnp

WIDE = 185728
N = 212992
P = 14


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    stack_np = jnp.asarray(rng.normal(size=(WIDE, 128)).astype(np.float32))
    # a stack that came out of a jit computation (like a flax param)
    stack_jit = jax.jit(lambda x: x * 1.0001)(stack_np)
    jax.block_until_ready(stack_jit)

    ids_uniform = jnp.asarray(rng.integers(0, WIDE, size=N, dtype=np.int32))
    # banded ids like the model: position n = example*26 + f, feature f's ids
    # confined to band [f*7142, (f+1)*7142)
    per_feat = rng.integers(0, 100_000, size=(8192, 26), dtype=np.int32)
    banded = (per_feat + np.arange(26, dtype=np.int32)[None, :] * 100_000)
    ids_banded = jnp.asarray(banded.reshape(-1) // P)

    f = jax.jit(lambda s, i: jnp.take(s, i, axis=0).sum())
    print(f"fresh stack, uniform ids: {timeit(f, stack_np, ids_uniform)*1e3:8.3f} ms")
    print(f"fresh stack, banded ids:  {timeit(f, stack_np, ids_banded)*1e3:8.3f} ms")
    print(f"jit stack,   uniform ids: {timeit(f, stack_jit, ids_uniform)*1e3:8.3f} ms")
    print(f"jit stack,   banded ids:  {timeit(f, stack_jit, ids_banded)*1e3:8.3f} ms")

    # does dividing on the fly matter?
    lids = jnp.asarray(banded.reshape(-1))
    f2 = jax.jit(lambda s, i: jnp.take(s, i // P, axis=0).sum())
    print(f"fresh stack, div-on-fly:  {timeit(f2, stack_np, lids)*1e3:8.3f} ms")

    # feature-major order (all of feature 0's ids, then feature 1's, ...)
    ids_fmajor = jnp.asarray(
        (banded.T.reshape(-1) // P).astype(np.int32))
    print(f"fresh stack, feat-major:  {timeit(f, stack_np, ids_fmajor)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()


def closure_test():
    rng = np.random.default_rng(1)
    stack = jnp.asarray(rng.normal(size=(WIDE, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, WIDE, size=N, dtype=np.int32))
    fc = jax.jit(lambda i: jnp.take(stack, i, axis=0).sum())
    print(f"closure-captured stack:   {timeit(fc, ids)*1e3:8.3f} ms")
    import flax.core
    fstack = flax.core.freeze({"t": stack})["t"]
    fc2 = jax.jit(lambda i: jnp.take(fstack, i, axis=0).sum())
    print(f"frozen-dict leaf stack:   {timeit(fc2, ids)*1e3:8.3f} ms")


closure_test()
