"""Scratch lab: DIN attention scorer kernel structure experiments (round 5).

Variants of the forward scorer at the DIN bench shape, to find a Pallas
structure that beats XLA's 1.1 ms before investing in the backward kernel.

Usage: python -m benchmarks.din_kernel_lab [--batch 16384]
"""
import argparse
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recommender_system_tpu.utils.benchmark import bench_fn
from recommender_system_tpu.ops.pallas_kernels import NEG_INF


def xla_fwd(q, keys, mask, w1, b1, w2, b2, w3, b3):
    from recommender_system_tpu.ops.pallas_kernels import din_attention_ref
    return din_attention_ref(q, keys, mask, w1, b1, w2, b2, w3, b3)


def xla_fwd_bf16(q, keys, mask, w1, b1, w2, b2, w3, b3):
    from recommender_system_tpu.ops.pallas_kernels import din_attention_ref
    return din_attention_ref(q, keys, mask, w1, b1, w2, b2, w3, b3,
                             dtype=jnp.bfloat16)


# --- variant B: 3-D dot, no reshape -----------------------------------------

def _kernel_3d(q_ref, k_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               w3_ref, b3_ref, o_ref):
    q = q_ref[:]            # [bm, K]
    keys = k_ref[:]         # [bm, T, K]
    mask = mask_ref[:]
    bm, T, K = keys.shape
    w1 = w1_ref[:]
    wq, wk, wm, wp = w1[:K], w1[K:2 * K], w1[2 * K:3 * K], w1[3 * K:]
    a = jnp.dot(q, wq + wm, preferred_element_type=jnp.float32)
    qk = q[:, None, :] * keys
    h = (jnp.dot(keys, wk - wm, preferred_element_type=jnp.float32)
         + jnp.dot(qk, wp, preferred_element_type=jnp.float32))
    h = jax.nn.sigmoid(h + a[:, None, :] + b1_ref[:][None, :, :])
    h2 = jax.nn.sigmoid(jnp.dot(h, w2_ref[:],
                                preferred_element_type=jnp.float32)
                        + b2_ref[:][None, :, :])
    score = (jnp.dot(h2, w3_ref[:],
                     preferred_element_type=jnp.float32)
             + b3_ref[:][None, :, :])[..., 0]
    valid = mask > 0.5
    score = jax.nn.softmax(jnp.where(valid, score, NEG_INF), axis=-1)
    o_ref[:] = jnp.sum(score[:, :, None] * keys, axis=1)


def pallas_3d(q, keys, mask, w1, b1, w2, b2, w3, b3, tile=256):
    B, T, K = keys.shape
    H1, H2 = w1.shape[1], w2.shape[1]
    grid = pl.cdiv(B, tile)
    return pl.pallas_call(
        _kernel_3d,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, K), lambda i: (i, 0)),
            pl.BlockSpec((tile, T, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile, T), lambda i: (i, 0)),
            pl.BlockSpec((4 * K, H1), lambda i: (0, 0)),
            pl.BlockSpec((1, H1), lambda i: (0, 0)),
            pl.BlockSpec((H1, H2), lambda i: (0, 0)),
            pl.BlockSpec((1, H2), lambda i: (0, 0)),
            pl.BlockSpec((H2, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, K), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
    )(q, keys, mask.astype(jnp.float32), w1, b1.reshape(1, -1), w2,
      b2.reshape(1, -1), w3, b3.reshape(1, 1))


# --- variant C: grid over (B, T), 2-D per-t blocks, logits [T, B] ------------

def _kernel_per_t(q_ref, k_ref, a_ref, wkp_ref, w2_ref, b2_ref, w3_ref,
                  b3_ref, o_ref):
    q = q_ref[:]                       # [bm, K]
    keys = k_ref[0]                    # [bm, K]  (block (1, bm, K) on [T,B,K])
    a = a_ref[:]                       # [bm, H1] = q @ (wq+wm) + b1
    K = q.shape[-1]
    wkp = wkp_ref[:]                   # [2K, H1] = [[wk-wm],[wp]]
    h = (jnp.dot(keys, wkp[:K], preferred_element_type=jnp.float32)
         + jnp.dot(q * keys, wkp[K:], preferred_element_type=jnp.float32)
         + a)
    h = jax.nn.sigmoid(h)
    h2 = jax.nn.sigmoid(jnp.dot(h, w2_ref[:],
                                preferred_element_type=jnp.float32)
                        + b2_ref[:])
    o_ref[:] = (jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
                + b3_ref[:]).T


def pallas_per_t(q, keys_t, mask, w1, b1, w2, b2, w3, b3, tile=2048):
    # keys_t: [T, B, K] (pre-transposed)
    T, B, K = keys_t.shape
    H1, H2 = w1.shape[1], w2.shape[1]
    wq, wk, wm, wp = w1[:K], w1[K:2 * K], w1[2 * K:3 * K], w1[3 * K:]
    a = jnp.dot(q, wq + wm, preferred_element_type=jnp.float32) + b1
    wkp = jnp.concatenate([wk - wm, wp], axis=0)
    logits_t = pl.pallas_call(
        _kernel_per_t,
        grid=(pl.cdiv(B, tile), T),
        in_specs=[
            pl.BlockSpec((tile, K), lambda i, t: (i, 0)),
            pl.BlockSpec((1, tile, K), lambda i, t: (t, i, 0)),
            pl.BlockSpec((tile, H1), lambda i, t: (i, 0)),
            pl.BlockSpec((2 * K, H1), lambda i, t: (0, 0)),
            pl.BlockSpec((H1, H2), lambda i, t: (0, 0)),
            pl.BlockSpec((1, H2), lambda i, t: (0, 0)),
            pl.BlockSpec((H2, 1), lambda i, t: (0, 0)),
            pl.BlockSpec((1, 1), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i, t: (t, i)),
        out_shape=jax.ShapeDtypeStruct((T, B), jnp.float32),
    )(q, keys_t, a, wkp, w2, b2.reshape(1, -1), w3, b3.reshape(1, 1))
    logits = logits_t.T
    score = jax.nn.softmax(jnp.where(mask, logits, NEG_INF), axis=-1)
    return jnp.einsum("bt,btk->bk", score, jnp.swapaxes(keys_t, 0, 1),
                      preferred_element_type=jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    args = ap.parse_args()
    B, T, K, h1, h2 = args.batch, 50, 32, 80, 40
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    keys = jnp.asarray(rng.standard_normal((B, T, K)), jnp.float32)
    mask = jnp.asarray(
        np.arange(T)[None, :] < rng.integers(5, T + 1, size=B)[:, None])
    w1 = jnp.asarray(rng.standard_normal((4 * K, h1)) * 0.05, jnp.float32)
    b1 = jnp.zeros((h1,))
    w2 = jnp.asarray(rng.standard_normal((h1, h2)) * 0.05, jnp.float32)
    b2 = jnp.zeros((h2,))
    w3 = jnp.asarray(rng.standard_normal((h2, 1)) * 0.05, jnp.float32)
    b3 = jnp.zeros((1,))
    argsf = (q, keys, mask, w1, b1, w2, b2, w3, b3)

    ref = jax.jit(xla_fwd)(*argsf)
    t = bench_fn(jax.jit(xla_fwd), *argsf)
    print(f"XLA f32           : {t*1e6:7.0f} us")
    t = bench_fn(jax.jit(xla_fwd_bf16), *argsf)
    print(f"XLA bf16          : {t*1e6:7.0f} us")

    try:
        out = jax.jit(pallas_3d)(*argsf)
        err = float(jnp.max(jnp.abs(out - ref)))
        t = bench_fn(jax.jit(pallas_3d), *argsf)
        print(f"pallas 3d dot     : {t*1e6:7.0f} us   maxerr {err:.2e}")
    except Exception as e:
        print(f"pallas 3d dot     : FAILED {type(e).__name__}: {e}")

    keys_t = jnp.swapaxes(keys, 0, 1)
    argst = (q, keys_t, mask, w1, b1, w2, b2, w3, b3)
    try:
        out = jax.jit(pallas_per_t)(*argst)
        err = float(jnp.max(jnp.abs(out - ref)))
        t = bench_fn(jax.jit(pallas_per_t), *argst)
        print(f"pallas per-t [T,B]: {t*1e6:7.0f} us   maxerr {err:.2e} "
              f"(excl. transpose)")
    except Exception as e:
        print(f"pallas per-t [T,B]: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
