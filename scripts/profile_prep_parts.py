"""Standalone costs of the fused-adagrad prologue pieces at bench N=426k."""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from recommender_system_tpu.utils.benchmark import bench_fn, time_iterations
from recommender_system_tpu.ops.fused_adagrad import (
    _lane_shift_matmul, _build_queue_sparse, fused_adagrad_apply)
from recommender_system_tpu.ops.embedding_grad import _SENTINEL

N = 26 * 16384
ROWS, PACK, DIM = 185856, 14, 9
rng = np.random.default_rng(0)
lids = jnp.asarray(rng.integers(0, ROWS * PACK, N, dtype=np.int32))
ct = jnp.asarray(rng.normal(size=(N, DIM)).astype(np.float32))

sort2 = jax.jit(lambda i: jax.lax.sort(
    [i, jnp.arange(N, dtype=jnp.int32)], num_keys=1)[0].sum())
print(f"sort (key+payload)      : {bench_fn(sort2, lids)*1e3:7.3f} ms")

sort1 = jax.jit(lambda i: jax.lax.sort([i], num_keys=1)[0].sum())
print(f"sort (key only)         : {bench_fn(sort1, lids)*1e3:7.3f} ms")

order = jax.lax.sort([lids, jnp.arange(N, dtype=jnp.int32)], num_keys=1)[1]
take = jax.jit(lambda c, o: jnp.take(c, o, axis=0).sum())
print(f"take reorder [N,9]      : {bench_fn(take, ct, order)*1e3:7.3f} ms")

slid = jnp.sort(lids)
shift = jax.jit(lambda c, s: _lane_shift_matmul(
    c, s % PACK, PACK, DIM, jnp.bfloat16).sum())
print(f"lane-shift matmul       : {bench_fn(shift, ct, slid)*1e3:7.3f} ms")

queue = jax.jit(lambda s: sum(
    x.sum() for x in _build_queue_sparse(s // PACK, N, ROWS, 512, 1024)[:2]))
print(f"queue build             : {bench_fn(queue, slid)*1e3:7.3f} ms")

# pad+set streams (the sids_p/sg_p materialization)
chunk = 1024
pad_chunk = (N + chunk - 1) // chunk
n_pad = (pad_chunk + 1) * chunk
sg = _lane_shift_matmul(ct, slid % PACK, PACK, DIM, jnp.bfloat16)
pads = jax.jit(lambda swid, g: (
    jnp.full((1, n_pad), _SENTINEL, jnp.int32).at[0, :N].set(swid).sum()
    + jnp.zeros((n_pad, 128), jnp.bfloat16).at[:N].set(g).sum()
    .astype(jnp.float32)))
print(f"pad/set streams         : {bench_fn(pads, slid // PACK, sg)*1e3:7.3f} ms")

# donated end-to-end fused apply (true in-pipeline cost, no copies)
stack = jnp.asarray(rng.normal(size=(ROWS, 128)).astype(np.float32))
acc = jnp.full((ROWS, 128), 0.1, jnp.float32)

@partial(jax.jit, donate_argnums=(0, 1))
def apply_d(s, a, i, c):
    return fused_adagrad_apply(s, a, i, c, pack=PACK, dim=DIM, lr=0.05,
                               stream_dtype=jnp.bfloat16)

holder = {"sa": (stack, acc)}
def run_n(n):
    s, a = holder["sa"]
    for _ in range(n):
        s, a = apply_d(s, a, lids, ct)
    holder["sa"] = (s, a)
    return s
sec = time_iterations(run_n, 5, 25)
print(f"fused apply (donated)   : {sec*1e3:7.3f} ms")
