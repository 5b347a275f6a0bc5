"""Can XLA fuse a cheap lane-shift into the scatter? ct [N,9] -> dense [ROWS,128]."""
import numpy as np
import jax
import jax.numpy as jnp

from recommender_system_tpu.utils.benchmark import bench_fn

N = 8192 * 26
ROWS = 185728
P, D = 14, 9

rng = np.random.default_rng(0)
lids = rng.integers(0, ROWS * P, size=N, dtype=np.int32)
wid = jnp.asarray(lids // P)
slot = jnp.asarray(lids % P)
ct = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

order = np.argsort(lids // P, kind="stable").astype(np.int32)
wid_s = jnp.asarray((lids // P)[order])
slot_s = jnp.asarray((lids % P)[order])
order = jnp.asarray(order)


def t(name, f, *a):
    tt = bench_fn(jax.jit(f), *a)
    print(f"{name:46s} {tt*1e3:8.3f} ms")
    return f


def shift_einsum(ct, slot):
    onehot = (slot[:, None] == jnp.arange(P)[None, :]).astype(jnp.float32)
    wide = jnp.einsum("np,nd->npd", onehot, ct).reshape(N, P * D)
    return jnp.pad(wide, ((0, 0), (0, 128 - P * D)))


def shift_tilemask(ct, slot):
    # out[n, l] = ct[n, l % D] * (l // D == slot[n]) for l < P*D
    l = jnp.arange(128)
    ct_pad = jnp.pad(ct, ((0, 0), (0, 128 - D)))  # only first D cols used
    tiled = jnp.take(ct_pad, jnp.where(l < P * D, l % D, D), axis=1,
                     fill_value=0.0)  # static gather of columns
    mask = (l[None, :] // D) == slot[:, None]
    mask = mask & (l[None, :] < P * D)
    return jnp.where(mask, tiled, 0.0)


# sanity
a = shift_einsum(ct, slot)
b = shift_tilemask(ct, slot)
print("shift formulations agree:", bool(jnp.allclose(a, b)))

t("lane-shift einsum", shift_einsum, ct, slot)
t("lane-shift tile+mask", shift_tilemask, ct, slot)

t("einsum -> scatter",
  lambda c, s, w: jnp.zeros((ROWS, 128), jnp.float32).at[w].add(
      shift_einsum(c, s)), ct, slot, wid)
t("tile+mask -> scatter",
  lambda c, s, w: jnp.zeros((ROWS, 128), jnp.float32).at[w].add(
      shift_tilemask(c, s)), ct, slot, wid)
t("tile+mask -> sorted scatter",
  lambda c, s, w, o: jnp.zeros((ROWS, 128), jnp.float32).at[w].add(
      shift_tilemask(jnp.take(c, o, axis=0), s), indices_are_sorted=True),
  ct, slot_s, wid_s, order)
# gather ct sorted is only [N,9] so cheap; measure it
t("gather ct[N,9] into sorted order",
  lambda c, o: jnp.take(c, o, axis=0), ct, order)
