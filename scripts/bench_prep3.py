"""Lane-shift via MXU matmul + fused mask (gather-free)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from recommender_system_tpu.ops.embedding_grad import _lane_shift

PACK, DIM = 14, 9
N = 212992

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
ct = jnp.asarray(rng.normal(size=(N, DIM)).astype(np.float32))
slot = jnp.asarray(rng.integers(0, PACK, size=N, dtype=np.int32))

# SEL[j, l] = 1 iff l < PACK*DIM and l % DIM == j
lanes = np.arange(128)
SEL = ((lanes % DIM)[None, :] == np.arange(DIM)[:, None]) & (lanes < PACK * DIM)[None, :]
SEL_f = jnp.asarray(SEL.astype(np.float32))

def shift_matmul(c, s):
    tiled = jnp.dot(c, SEL_f, preferred_element_type=jnp.float32)  # [N,128]
    mask = (jnp.arange(128)[None, :] // DIM) == s[:, None]
    return jnp.where(mask, tiled, 0.0)

a = jax.jit(lambda c, s: _lane_shift(c, s, PACK, DIM))(ct, slot)
b = jax.jit(shift_matmul)(ct, slot)
print("equal:", bool(jnp.allclose(a, b)))
print(f"shift old (lane gather): {timeit(jax.jit(lambda c,s: _lane_shift(c,s,PACK,DIM).sum()), ct, slot)*1e3:8.3f} ms")
print(f"shift matmul+mask:       {timeit(jax.jit(lambda c,s: shift_matmul(c,s).sum()), ct, slot)*1e3:8.3f} ms")

# bf16 output variant (stream dtype)
def shift_matmul_bf16(c, s):
    tiled = jnp.dot(c.astype(jnp.bfloat16), SEL_f.astype(jnp.bfloat16),
                    preferred_element_type=jnp.bfloat16)
    mask = (jnp.arange(128)[None, :] // DIM) == s[:, None]
    return jnp.where(mask, tiled, jnp.bfloat16(0))
print(f"shift matmul bf16 out:   {timeit(jax.jit(lambda c,s: shift_matmul_bf16(c,s).sum()), ct, slot)*1e3:8.3f} ms")
