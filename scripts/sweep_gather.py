"""Gather-strategy sweep for the packed embedding forward (v5e, scalar fetch).

Questions:
1. does sorted-id order speed up the random row gather (HBM locality)?
2. does a bf16 table halve gather time?
3. cheaper lane-select than the [N,P,d] one-hot einsum?
4. cost of jax.lax.sort over N ids (reusable by backward via custom_vjp)?
5. full fused candidate: sort -> gather sorted -> lane-select -> narrow unsort.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 8192 * 26
VOCAB_L = 100_000 * 26
DIM = 9
P = 128 // DIM  # 14
WIDE = -(-((VOCAB_L + P - 1) // P) // 64) * 64


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
    lid_np = np.concatenate([
        rng.integers(0, 100_000, size=8192, dtype=np.int32) + f * 100_000
        for f in range(26)])
    rng.shuffle(lid_np)
    lid = jnp.asarray(lid_np)
    wid = lid // P
    wid_sorted = jnp.asarray(np.sort(np.asarray(wid)))
    stack = jnp.asarray(rng.normal(size=(WIDE, 128)).astype(np.float32))
    stack_bf16 = stack.astype(jnp.bfloat16)

    f = jax.jit(lambda s, i: jnp.take(s, i, axis=0).sum())
    print(f"gather random order  f32: {timeit(f, stack, wid)*1e3:8.3f} ms")
    print(f"gather sorted order  f32: {timeit(f, stack, wid_sorted)*1e3:8.3f} ms")
    print(f"gather random order bf16: {timeit(f, stack_bf16, wid)*1e3:8.3f} ms")
    print(f"gather sorted order bf16: {timeit(f, stack_bf16, wid_sorted)*1e3:8.3f} ms")

    # sort cost (ids + iota payload, the backward's exact sort)
    fs = jax.jit(lambda i: jax.lax.sort(
        [i, jnp.arange(N, dtype=jnp.int32)], num_keys=1)[0].sum())
    print(f"sort N ids + iota:        {timeit(fs, lid)*1e3:8.3f} ms")

    # argsort alternative
    fa = jax.jit(lambda i: jnp.argsort(i).sum())
    print(f"argsort N ids:            {timeit(fa, lid)*1e3:8.3f} ms")

    # lane-select variants on a pre-gathered [N,128] buffer
    wide_buf = jnp.take(stack, wid, axis=0)
    slot = lid % P

    def sel_einsum(w, s):
        ww = w[:, : P * DIM].reshape(-1, P, DIM)
        sel = s[:, None] == jnp.arange(P)[None, :]
        return jnp.einsum("np,npd->nd", sel.astype(w.dtype), ww).sum()

    def sel_mask(w, s):
        lanes = jnp.arange(128)
        col = jnp.where(lanes < P * DIM, lanes % DIM, 0)
        keep = (lanes[None, :] // DIM) == s[:, None]
        picked = jnp.where(keep & (lanes < P * DIM)[None, :], w, 0.0)
        # sum over the P slots: reshape trick needs P*DIM lanes
        pp = picked[:, : P * DIM].reshape(-1, P, DIM)
        return pp.sum(axis=1).sum()

    def sel_dynslice(w, s):
        # per-row dynamic slice via take_along_axis
        base = (s * DIM)[:, None] + jnp.arange(DIM)[None, :]
        return jnp.take_along_axis(w, base, axis=1).sum()

    print(f"lane-select einsum:       {timeit(jax.jit(sel_einsum), wide_buf, slot)*1e3:8.3f} ms")
    print(f"lane-select mask+reduce:  {timeit(jax.jit(sel_mask), wide_buf, slot)*1e3:8.3f} ms")
    print(f"lane-select take_along:   {timeit(jax.jit(sel_dynslice), wide_buf, slot)*1e3:8.3f} ms")

    # fused candidates: end-to-end packed_take = ids -> [N, DIM]
    def cand_current(s, li):
        w = jnp.take(s, li // P, axis=0)
        ww = w[:, : P * DIM].reshape(-1, P, DIM)
        sel = (li % P)[:, None] == jnp.arange(P)[None, :]
        return jnp.einsum("np,npd->nd", sel.astype(s.dtype), ww).sum()

    def cand_sorted(s, li):
        sl, order = jax.lax.sort([li, jnp.arange(N, dtype=jnp.int32)],
                                 num_keys=1)
        w = jnp.take(s, sl // P, axis=0)
        base = ((sl % P) * DIM)[:, None] + jnp.arange(DIM)[None, :]
        narrow = jnp.take_along_axis(w, base, axis=1)  # [N, DIM] sorted
        out = jnp.zeros((N, DIM), s.dtype).at[order].set(narrow)
        return out.sum()

    def cand_sorted_unsort_gather(s, li):
        sl, inv = jax.lax.sort([li, jnp.arange(N, dtype=jnp.int32)],
                               num_keys=1)
        w = jnp.take(s, sl // P, axis=0)
        base = ((sl % P) * DIM)[:, None] + jnp.arange(DIM)[None, :]
        narrow = jnp.take_along_axis(w, base, axis=1)
        # unsort via gather: need rank of each original position
        rank = jnp.zeros((N,), jnp.int32).at[inv].set(
            jnp.arange(N, dtype=jnp.int32))
        return jnp.take(narrow, rank, axis=0).sum()

    print(f"cand current (einsum):    {timeit(jax.jit(cand_current), stack, lid)*1e3:8.3f} ms")
    print(f"cand sorted+scatter-un:   {timeit(jax.jit(cand_sorted), stack, lid)*1e3:8.3f} ms")
    print(f"cand sorted+gather-un:    {timeit(jax.jit(cand_sorted_unsort_gather), stack, lid)*1e3:8.3f} ms")
    bf = stack_bf16
    print(f"cand current bf16:        {timeit(jax.jit(cand_current), bf, lid)*1e3:8.3f} ms")
    print(f"cand sorted+gather bf16:  {timeit(jax.jit(cand_sorted_unsort_gather), bf, lid)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
