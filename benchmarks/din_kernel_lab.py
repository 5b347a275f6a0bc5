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


# --- variant D: XLA, keys||qk combined 64-wide contraction -------------------

def xla_fwd_c64(q, keys, mask, w1, b1, w2, b2, w3, b3, cdt=jnp.float32):
    """Same math as din_attention_ref but the keys and q*k first-layer dots
    are fused into ONE dot with a 64-wide contraction (vs two 32-wide): the
    MXU contraction utilization doubles if XLA fuses the concat into the
    dot's operand read."""
    K = keys.shape[-1]
    w1c = w1.astype(cdt)
    q_c, keys_c = q.astype(cdt), keys.astype(cdt)
    wq, wk, wm, wp = w1c[:K], w1c[K:2 * K], w1c[2 * K:3 * K], w1c[3 * K:]
    a = jnp.dot(q_c, wq + wm, preferred_element_type=jnp.float32)
    ck = jnp.concatenate([keys_c, q_c[:, None, :] * keys_c], axis=-1)
    wkp = jnp.concatenate([wk - wm, wp], axis=0)
    h = jax.nn.sigmoid(jnp.dot(ck, wkp, preferred_element_type=jnp.float32)
                       + a[:, None, :] + b1)
    h = jax.nn.sigmoid(jnp.dot(h.astype(cdt), w2.astype(cdt),
                               preferred_element_type=jnp.float32) + b2)
    score = (jnp.dot(h.astype(cdt), w3.astype(cdt),
                     preferred_element_type=jnp.float32) + b3)[..., 0]
    score = jax.nn.softmax(jnp.where(mask, score, NEG_INF), axis=-1)
    return jnp.einsum("bt,btk->bk", score, keys,
                      preferred_element_type=jnp.float32)


# --- variant F: Pallas 8-t-slices per step over flat [B, T*K], concat128 ----
#
# Block constraints force last-two block dims to (8k, 128k): a key block
# (tile, 256) on the flat [B, T*K] view covers 8 consecutive t-slices
# (8*K = 256 lanes), and the logits output block is (8, tile) on a [T8, B]
# array with T8 = ceil(T/8)*8.  Edge blocks past T*K read garbage — rows are
# independent, and the XLA-side mask never selects t >= T.

def _kernel_flat8(q_ref, k_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                  b3_ref, o_ref, *, cdt):
    q = q_ref[:].astype(cdt)           # [tile, K]
    K = q.shape[-1]
    kblk = k_ref[:]                    # [tile, 8*K]
    w1 = w1_ref[:].astype(cdt)
    w2 = w2_ref[:].astype(cdt)
    w3row = w3_ref[:][:, 0][None, :]
    for j in range(8):
        k = kblk[:, j * K:(j + 1) * K].astype(cdt)
        c = jnp.concatenate([q, k, q - k, q * k], axis=-1)  # [tile, 4K=128]
        h = jax.nn.sigmoid(
            jnp.dot(c, w1, preferred_element_type=jnp.float32) + b1_ref[:])
        h2 = jax.nn.sigmoid(
            jnp.dot(h.astype(cdt), w2,
                    preferred_element_type=jnp.float32) + b2_ref[:])
        o_ref[j, :] = jnp.sum(h2 * w3row, axis=-1) + b3_ref[0, 0]


def pallas_flat8(q, keys, mask, w1, b1, w2, b2, w3, b3, tile=2048,
                 cdt=jnp.float32):
    B, T, K = keys.shape
    H1, H2 = w1.shape[1], w2.shape[1]
    T8 = ((T + 7) // 8) * 8
    kflat = keys.reshape(B, T * K)
    logits_t = pl.pallas_call(
        functools.partial(_kernel_flat8, cdt=cdt),
        grid=(pl.cdiv(B, tile), T8 // 8),
        in_specs=[
            pl.BlockSpec((tile, K), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, 8 * K), lambda i, j: (i, j)),
            pl.BlockSpec((4 * K, H1), lambda i, j: (0, 0)),
            pl.BlockSpec((1, H1), lambda i, j: (0, 0)),
            pl.BlockSpec((H1, H2), lambda i, j: (0, 0)),
            pl.BlockSpec((1, H2), lambda i, j: (0, 0)),
            pl.BlockSpec((H2, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda i, j: (j, i)),
        out_shape=jax.ShapeDtypeStruct((T8, B), jnp.float32),
    )(q, kflat, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1), w3,
      b3.reshape(1, 1))
    logits = logits_t[:T].T
    score = jax.nn.softmax(jnp.where(mask, logits, NEG_INF), axis=-1)
    return jnp.einsum("bt,btk->bk", score, keys,
                      preferred_element_type=jnp.float32)


# --- variant E: Pallas per-t over a flat [B, T*K] view, concat128 in VMEM ----
#
# No pre-transpose needed: keys.reshape(B, T*K) is a free bitcast, and
# BlockSpec((tile, K), lambda i, t: (i, t)) addresses the t-th key slice
# directly.  In VMEM the full [q, k, q-k, q*k] 128-wide concat IS built
# (it is tiny there), so the first-layer dot runs at full MXU contraction —
# the opposite tradeoff from the XLA path, where the concat is decomposed
# to avoid a 210 MB HBM materialization.

def _kernel_flat_t(q_ref, k_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                   b3_ref, o_ref, *, cdt):
    q = q_ref[:].astype(cdt)           # [tile, K]
    k = k_ref[:].astype(cdt)           # [tile, K]
    c = jnp.concatenate([q, k, q - k, q * k], axis=-1)   # [tile, 4K]
    h = jax.nn.sigmoid(
        jnp.dot(c, w1_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + b1_ref[:])
    h2 = jax.nn.sigmoid(
        jnp.dot(h.astype(cdt), w2_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + b2_ref[:])
    logits = jnp.sum(h2 * w3_ref[:][:, 0][None, :], axis=-1) + b3_ref[0, 0]
    o_ref[0, :] = logits


def pallas_flat_t(q, keys, mask, w1, b1, w2, b2, w3, b3, tile=4096,
                  cdt=jnp.float32):
    B, T, K = keys.shape
    H1, H2 = w1.shape[1], w2.shape[1]
    kflat = keys.reshape(B, T * K)
    logits_t = pl.pallas_call(
        functools.partial(_kernel_flat_t, cdt=cdt),
        grid=(pl.cdiv(B, tile), T),
        in_specs=[
            pl.BlockSpec((tile, K), lambda i, t: (i, 0)),
            pl.BlockSpec((tile, K), lambda i, t: (i, t)),
            pl.BlockSpec((4 * K, H1), lambda i, t: (0, 0)),
            pl.BlockSpec((1, H1), lambda i, t: (0, 0)),
            pl.BlockSpec((H1, H2), lambda i, t: (0, 0)),
            pl.BlockSpec((1, H2), lambda i, t: (0, 0)),
            pl.BlockSpec((H2, 1), lambda i, t: (0, 0)),
            pl.BlockSpec((1, 1), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i, t: (t, i)),
        out_shape=jax.ShapeDtypeStruct((T, B), jnp.float32),
    )(q, kflat, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1), w3,
      b3.reshape(1, 1))
    logits = logits_t.T
    score = jax.nn.softmax(jnp.where(mask, logits, NEG_INF), axis=-1)
    return jnp.einsum("bt,btk->bk", score, keys,
                      preferred_element_type=jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--tiles", default="2048")
    ap.add_argument("--skip-xla", action="store_true")
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
    if not args.skip_xla:
        t = bench_fn(jax.jit(xla_fwd), *argsf)
        print(f"XLA f32           : {t*1e6:7.0f} us")
        t = bench_fn(jax.jit(xla_fwd_bf16), *argsf)
        print(f"XLA bf16          : {t*1e6:7.0f} us")

    # pallas_3d and pallas_per_t are kept above for the record but skipped:
    # 3d OOMs VMEM (the [tile, T, K] block lane-pads K=32 -> 128, 4x), and
    # per_t's (1, tile) output block violates the (8, 128) divisibility rule.

    if not args.skip_xla:
        for cdt, nm in ((jnp.float32, "f32 "), (jnp.bfloat16, "bf16")):
            f = jax.jit(functools.partial(xla_fwd_c64, cdt=cdt))
            out = f(*argsf)
            err = float(jnp.max(jnp.abs(out - ref)))
            t = bench_fn(f, *argsf)
            print(f"XLA c64 {nm}      : {t*1e6:7.0f} us   maxerr {err:.2e}")

    for tile in tuple(int(x) for x in args.tiles.split(",")):
        for cdt, nm in ((jnp.float32, "f32 "), (jnp.bfloat16, "bf16")):
            try:
                f = jax.jit(functools.partial(pallas_flat8, tile=tile,
                                              cdt=cdt))
                out = f(*argsf)
                err = float(jnp.max(jnp.abs(out - ref)))
                t = bench_fn(f, *argsf)
                print(f"pallas flat8 {nm} tile={tile:5d}: {t*1e6:7.0f} us"
                      f"   maxerr {err:.2e}")
            except Exception as e:
                print(f"pallas flat8 {nm} tile={tile:5d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
