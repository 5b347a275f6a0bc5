"""Sweep scatter_add_dense tile params at the DeepFM bench backward shape:
N=213120 lane-shifted [N,128] cotangents into 196608-row packed stack."""
import numpy as np
import jax
import jax.numpy as jnp

from recommender_system_tpu.utils.benchmark import bench_fn
from recommender_system_tpu.ops.embedding_grad import (scatter_add_dense,
                                                       scatter_add_dense_ref)

N = 8192 * 26
ROWS = 185728  # wide rows for 2.6M logical / P=14, rounded to 64

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, ROWS, size=N, dtype=np.int32))
grads = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))

# correctness reference on a small slice
ref = jax.jit(lambda i, g: scatter_add_dense_ref(i, g, ROWS))

t = bench_fn(ref, ids, grads)
print(f"XLA scatter-add:                       {t*1e3:8.3f} ms")
expect = ref(ids, grads)

for tile_rows, chunk, subtiles in [
    (512, 256, 16),
    (512, 128, 16),
    (256, 256, 32),
    (1024, 256, 8),
    (512, 512, 16),
    (1024, 512, 8),
    (2048, 256, 4),
]:
    try:
        f = jax.jit(lambda i, g, tr=tile_rows, c=chunk, s=subtiles:
                    scatter_add_dense(i, g, ROWS, tile_rows=tr, chunk=c,
                                      subtiles=s))
        out = f(ids, grads)
        err = float(jnp.max(jnp.abs(out - expect)))
        t = bench_fn(f, ids, grads)
        print(f"pallas tr={tile_rows:5d} chunk={chunk:4d} st={subtiles:3d}: "
              f"{t*1e3:8.3f} ms   maxerr={err:.2e}")
    except Exception as e:
        print(f"pallas tr={tile_rows:5d} chunk={chunk:4d} st={subtiles:3d}: "
              f"FAILED {str(e)[:120]}")
