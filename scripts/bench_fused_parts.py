"""Per-piece timing of the fused adagrad pipeline (explicit args, scalar fetch)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recommender_system_tpu.ops.embedding_grad import _SENTINEL, _lane_shift
from recommender_system_tpu.ops.fused_adagrad import (_build_queue_sparse,
                                                      _fused_adagrad_kernel)

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


def prep(lids, ct, stream_dtype):
    slid, order = jax.lax.sort([lids, jnp.arange(N, dtype=jnp.int32)],
                               num_keys=1)
    sct = jnp.take(ct, order, axis=0)
    swid = slid // PACK
    sg = _lane_shift(sct, slid % PACK, PACK, DIM).astype(stream_dtype)
    w_sub, w_chunk, W, n_sub, pad_chunk = _build_queue_sparse(
        swid, N, ROWS, TILE, CHUNK)
    n_pad = (pad_chunk + 1) * CHUNK
    sids_p = jnp.full((1, n_pad), _SENTINEL, jnp.int32).at[0, :N].set(swid)
    sg_p = jnp.zeros((n_pad, 128), stream_dtype).at[:N].set(sg)
    return w_sub, w_chunk, sids_p, sg_p, W, pad_chunk


def kernel_call(w_sub, w_chunk, hyper, sids_p, sg_p, stack, acc, W, pad_chunk,
                do_matmul=True):
    kern = functools.partial(
        _fused_adagrad_kernel, tile_rows=TILE, chunk=CHUNK, W=W,
        pad_chunk=pad_chunk if do_matmul else -1, eps=1e-7)
    # pad_chunk=-1 makes every item look like padding -> no matmul (stream-only)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(W,),
            in_specs=[
                pl.BlockSpec((1, CHUNK), lambda w, ws, wc, hy: (0, wc[w])),
                pl.BlockSpec((CHUNK, 128), lambda w, ws, wc, hy: (wc[w], 0)),
                pl.BlockSpec((TILE, 128), lambda w, ws, wc, hy: (ws[w], 0)),
                pl.BlockSpec((TILE, 128), lambda w, ws, wc, hy: (ws[w], 0)),
            ],
            out_specs=[
                pl.BlockSpec((TILE, 128), lambda w, ws, wc, hy: (ws[w], 0)),
                pl.BlockSpec((TILE, 128), lambda w, ws, wc, hy: (ws[w], 0)),
            ],
            scratch_shapes=[pltpu.VMEM((TILE, 128), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
                   jax.ShapeDtypeStruct((ROWS, 128), jnp.float32)],
        input_output_aliases={5: 0, 6: 1},
    )(w_sub, w_chunk, hyper, sids_p, sg_p, stack, acc)


def main():
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.normal(size=(ROWS, 128)).astype(np.float32))
    acc = jnp.full((ROWS, 128), 0.1, jnp.float32)
    lids = jnp.asarray(rng.integers(0, ROWS * PACK, size=N, dtype=np.int32))
    ct = jnp.asarray(rng.normal(size=(N, DIM)).astype(np.float32))
    hyper = jnp.asarray([0.05], jnp.float32)

    for sd in (jnp.float32, jnp.bfloat16):
        pf = jax.jit(lambda i, c, d=sd: jax.tree.map(
            lambda x: x.sum() if x.dtype != jnp.int32 else x.sum(),
            prep(i, c, d)[:4]))
        print(f"prep {sd.__name__:8s}:            {timeit(pf, lids, ct)*1e3:8.3f} ms")

        w_sub, w_chunk, sids_p, sg_p, W, pad_chunk = jax.jit(
            lambda i, c, d=sd: prep(i, c, d))(lids, ct)
        w_sub, w_chunk, sids_p, sg_p = jax.block_until_ready(
            (w_sub, w_chunk, sids_p, sg_p))
        W, pad_chunk = int(W), int(pad_chunk)
        print(f"  W={W} pad_chunk={pad_chunk}")

        for dm, lbl in ((True, "full"), (False, "stream-only")):
            kf = jax.jit(lambda ws, wc, hy, sp, gp, s, a, dm=dm: kernel_call(
                ws, wc, hy, sp, gp, s, a, W, pad_chunk, do_matmul=dm),
                donate_argnums=(5, 6))
            st, ac = stack, acc
            st, ac = kf(w_sub, w_chunk, hyper, sids_p, sg_p, st, ac)
            jax.block_until_ready((st, ac))
            float(np.asarray(st[0, 0]))
            t0 = time.perf_counter()
            n = 30
            for _ in range(n):
                st, ac = kf(w_sub, w_chunk, hyper, sids_p, sg_p, st, ac)
            float(np.asarray(st[0, 0]))
            t = (time.perf_counter() - t0) / n
            print(f"  kernel {lbl:12s} {sd.__name__:8s}: {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
