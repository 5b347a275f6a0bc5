"""Prep sub-piece timing + kernel error diagnosis."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from recommender_system_tpu.ops.embedding_grad import _SENTINEL, _lane_shift
from recommender_system_tpu.ops.fused_adagrad import _build_queue_sparse

ROWS = 185856
PACK, DIM = 14, 9
N = 212992
TILE, CHUNK = 512, 1024


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n


rng = np.random.default_rng(0)
lids = jnp.asarray(rng.integers(0, ROWS * PACK, size=N, dtype=np.int32))
ct = jnp.asarray(rng.normal(size=(N, DIM)).astype(np.float32))

iota = jnp.arange(N, dtype=jnp.int32)

f_sort = jax.jit(lambda i: jax.lax.sort([i, iota], num_keys=1)[0].sum())
print(f"a sort:                 {timeit(f_sort, lids)*1e3:8.3f} ms")

def s_take(i, c):
    sl, o = jax.lax.sort([i, iota], num_keys=1)
    return jnp.take(c, o, axis=0).sum() + sl.sum()
print(f"b sort+take:            {timeit(jax.jit(s_take), lids, ct)*1e3:8.3f} ms")

def s_shift(i, c):
    sl, o = jax.lax.sort([i, iota], num_keys=1)
    sct = jnp.take(c, o, axis=0)
    return _lane_shift(sct, sl % PACK, PACK, DIM).sum()
print(f"c sort+take+shift:      {timeit(jax.jit(s_shift), lids, ct)*1e3:8.3f} ms")

def s_pad(i, c):
    sl, o = jax.lax.sort([i, iota], num_keys=1)
    sct = jnp.take(c, o, axis=0)
    sg = _lane_shift(sct, sl % PACK, PACK, DIM)
    n_pad = (N // CHUNK + 2) * CHUNK
    sg_p = jnp.zeros((n_pad, 128), jnp.float32).at[:N].set(sg)
    return sg_p.sum()
print(f"d sort+take+shift+pad:  {timeit(jax.jit(s_pad), lids, ct)*1e3:8.3f} ms")

def s_queue(i):
    sl, o = jax.lax.sort([i, iota], num_keys=1)
    swid = sl // PACK
    parts = _build_queue_sparse(swid, N, ROWS, TILE, CHUNK)
    return parts[0].sum() + parts[1].sum()
print(f"e sort+queue:           {timeit(jax.jit(s_queue), lids)*1e3:8.3f} ms")
