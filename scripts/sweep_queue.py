"""TPU timing: work-queue scatter + full packed VJP path at bench shape."""
import numpy as np
import jax
import jax.numpy as jnp

from recommender_system_tpu.utils.benchmark import bench_fn
from recommender_system_tpu.ops.embedding_grad import (
    scatter_add_dense, scatter_add_dense_ref, packed_scatter_add,
    packed_take_fast, _packed_take_impl)

N = 8192 * 26
ROWS = 185728
P, D = 14, 9

rng = np.random.default_rng(0)
lids = jnp.asarray(rng.integers(0, ROWS * P, size=N, dtype=np.int32))
wid = lids // P
g128 = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
ct = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

# correctness on TPU vs XLA ref
out = scatter_add_dense(wid, g128, ROWS)
ref = scatter_add_dense_ref(wid, g128, ROWS)
rel = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
print(f"TPU correctness (rel err, bf16x1 expected ~4e-3): {rel:.2e}")

for tr, c in [(512, 1024), (512, 2048), (1024, 1024), (512, 512),
              (256, 1024), (1024, 2048), (2048, 2048)]:
    try:
        f = jax.jit(lambda i, g, tr=tr, c=c: scatter_add_dense(
            i, g, ROWS, tile_rows=tr, chunk=c))
        t = bench_fn(f, wid, g128)
        print(f"queue scatter tr={tr:5d} c={c:5d}: {t*1e3:8.3f} ms")
    except Exception as e:
        print(f"queue scatter tr={tr:5d} c={c:5d}: FAILED {str(e)[:100]}")

# full packed backward: ct[N,9] -> dense[ROWS,128] (sort+reorder+shift+kernel)
f = jax.jit(lambda l, c: packed_scatter_add(l, c, ROWS, P, D))
t = bench_fn(f, lids, ct)
print(f"packed_scatter_add (full bwd path): {t*1e3:8.3f} ms")

# VJP end to end
stack = jnp.zeros((ROWS, 128), jnp.float32)
fvjp = jax.jit(lambda s, l, c: jax.vjp(
    lambda s_: packed_take_fast(s_, l, P, D), s)[1](c)[0])
t = bench_fn(fvjp, stack, lids, ct)
print(f"packed_take_fast VJP:               {t*1e3:8.3f} ms")

fref = jax.jit(lambda s, l, c: jax.vjp(
    lambda s_: _packed_take_impl(s_, l, P, D), s)[1](c)[0])
t = bench_fn(fref, stack, lids, ct)
print(f"XLA einsum+scatter VJP (old path):  {t*1e3:8.3f} ms")
