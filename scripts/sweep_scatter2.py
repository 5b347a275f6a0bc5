"""XLA scatter variants + sort costs at the bench backward shape."""
import numpy as np
import jax
import jax.numpy as jnp

from recommender_system_tpu.utils.benchmark import bench_fn

N = 8192 * 26
ROWS = 185728

rng = np.random.default_rng(0)
ids_np = rng.integers(0, ROWS, size=N, dtype=np.int32)
ids = jnp.asarray(ids_np)
sids = jnp.asarray(np.sort(ids_np))
grads = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))


def t(name, f, *a):
    tt = bench_fn(jax.jit(f), *a)
    print(f"{name:42s} {tt*1e3:8.3f} ms")


t("scatter-add (plain)",
  lambda i, g: jnp.zeros((ROWS, 128), jnp.float32).at[i].add(g), ids, grads)
t("scatter-add (sorted ids)",
  lambda i, g: jnp.zeros((ROWS, 128), jnp.float32).at[i].add(
      g, indices_are_sorted=True), sids, grads)
t("scatter-add (sorted+unique claim)",
  lambda i, g: jnp.zeros((ROWS, 128), jnp.float32).at[i].add(
      g, indices_are_sorted=True, unique_indices=True), sids, grads)
t("argsort only", lambda i: jnp.argsort(i), ids)
t("sort_key_val (ids, arange)",
  lambda i: jax.lax.sort([i, jnp.arange(N, dtype=jnp.int32)], num_keys=1), ids)
t("gather grads into sorted order",
  lambda g, o: jnp.take(g, o, axis=0), grads,
  jnp.asarray(np.argsort(ids_np).astype(np.int32)))
t("searchsorted 186k bounds in 213k ids",
  lambda s: jnp.searchsorted(s, jnp.arange(0, ROWS + 1, 512, dtype=jnp.int32)),
  sids)
# the einsum lane-shift transpose (ct [N,9] -> [N,128]) that feeds the scatter
ct9 = jnp.asarray(rng.normal(size=(N, 9)).astype(np.float32))
sel = jnp.asarray(rng.integers(0, 14, size=N, dtype=np.int32))


def laneshift(ct, sel):
    onehot = (sel[:, None] == jnp.arange(14)[None, :]).astype(jnp.float32)
    wide = jnp.einsum("np,nd->npd", onehot, ct).reshape(N, 126)
    return jnp.pad(wide, ((0, 0), (0, 2)))


t("lane-shift einsum [N,9]->[N,128]", laneshift, ct9, sel)
