"""Prep variants: shift-then-take vs take-then-shift; queue build variants."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from recommender_system_tpu.ops.embedding_grad import _lane_shift
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

def shift_bcast(ct, slot):
    """[N,d]->[N,128] lane shift via broadcast-tile (no gather)."""
    reps = -(-128 // DIM)  # 15
    tiled = jnp.broadcast_to(ct[:, None, :], (N, reps, DIM)).reshape(N, reps * DIM)[:, :128]
    lanes = jnp.arange(128)
    mask = ((lanes[None, :] // DIM) == slot[:, None]) & (lanes < PACK * DIM)[None, :]
    return jnp.where(mask, tiled, 0.0)

def old_path(i, c):
    sl, o = jax.lax.sort([i, iota], num_keys=1)
    sct = jnp.take(c, o, axis=0)
    return _lane_shift(sct, sl % PACK, PACK, DIM).sum()

def new_path(i, c):
    wide = shift_bcast(c, i % PACK)          # original order, fused elementwise
    sl, o = jax.lax.sort([i, iota], num_keys=1)
    return jnp.take(wide, o, axis=0).sum()   # one wide random take

# check equal
a = jax.jit(lambda i, c: _lane_shift(jnp.take(c, jax.lax.sort([i, iota], num_keys=1)[1], axis=0), jax.lax.sort([i, iota], num_keys=1)[0] % PACK, PACK, DIM))(lids, ct)
b = jax.jit(lambda i, c: jnp.take(shift_bcast(c, i % PACK), jax.lax.sort([i, iota], num_keys=1)[1], axis=0))(lids, ct)
print("equal:", bool(jnp.allclose(a, b)))

print(f"old take->shift:   {timeit(jax.jit(old_path), lids, ct)*1e3:8.3f} ms")
print(f"new shift->take:   {timeit(jax.jit(new_path), lids, ct)*1e3:8.3f} ms")

# shift_bcast alone
print(f"shift_bcast alone: {timeit(jax.jit(lambda i, c: shift_bcast(c, i % PACK).sum()), lids, ct)*1e3:8.3f} ms")

# queue: searchsorted variants
bounds = jnp.arange(ROWS // TILE + 1, dtype=jnp.int32) * TILE
def q_scan(i):
    sl = jax.lax.sort([i], num_keys=1)[0] // PACK
    return jnp.searchsorted(sl, bounds).sum()
def q_unrolled(i):
    sl = jax.lax.sort([i], num_keys=1)[0] // PACK
    return jnp.searchsorted(sl, bounds, method='scan_unrolled').sum()
def q_compare(i):
    sl = jax.lax.sort([i], num_keys=1)[0] // PACK
    # ts[b] = #ids < bounds[b] via block compare-sum (VPU friendly)
    cnt = (sl[None, :] < bounds[:, None]).sum(axis=1)
    return cnt.sum()
print(f"queue scan:        {timeit(jax.jit(q_scan), lids)*1e3:8.3f} ms")
print(f"queue unrolled:    {timeit(jax.jit(q_unrolled), lids)*1e3:8.3f} ms")
print(f"queue compare:     {timeit(jax.jit(q_compare), lids)*1e3:8.3f} ms")
