"""Measure GRU/AUGRU fwd+bwd across {f32, bf16} x {store, remat} at the DIEN
bench shape (B=8192, T=50, D=H=32).

Round-2 finding (benchmarks/dien_parts.py): gru fwd is 0.54 ms but fwd+bwd is
3.0 ms — the scan's per-step gate residuals (~4 [B,H] f32 arrays x 50 steps,
~210 MB round trip) dominate. ``remat=True`` recomputes gates in backward from
(x_t, h_{t-1}); ``dtype=bf16`` halves the gate-matmul operand traffic.

Usage: python -m benchmarks.rnn_variants
"""
import numpy as np

import jax
import jax.numpy as jnp

from recommender_system_tpu.ops.rnn import augru, gru, init_gru_params
from recommender_system_tpu.utils.benchmark import bench_fn

B, T, D, H = 8192, 50, 32, 32


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    att = jnp.asarray(rng.random((B, T)).astype(np.float32))
    lengths = rng.integers(5, T + 1, size=B)
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
    params = init_gru_params(jax.random.PRNGKey(0), D, H)

    def make(fn, dtype, remat, use_att, unroll=1):
        if use_att:
            def f(p, x, a, m):
                def loss(p, x, a):
                    outs, h = fn(p, x, a, mask=m, dtype=dtype, remat=remat,
                                 unroll=unroll)
                    return jnp.sum(h)
                return jax.grad(loss, argnums=(0, 1, 2))(p, x, a)
            return jax.jit(f)

        def f(p, x, m):
            def loss(p, x):
                outs, h = fn(p, x, mask=m, dtype=dtype, remat=remat,
                             unroll=unroll)
                return jnp.sum(outs) + jnp.sum(h)
            return jax.grad(loss, argnums=(0, 1))(p, x)
        return jax.jit(f)

    print(f"shape B={B} T={T} D={D} H={H}, fwd+bwd times")
    for name, fn, use_att in (("gru", gru, False), ("augru", augru, True)):
        for dtype, dn in ((None, "f32"), (jnp.bfloat16, "bf16")):
            for remat in (False, True):
                for unroll in (1, 2, 5):
                    f = make(fn, dtype, remat, use_att, unroll)
                    args = (params, x, att, mask) if use_att \
                        else (params, x, mask)
                    t = bench_fn(f, *args)
                    print(f"{name:6s} {dn:4s} remat={int(remat)} "
                          f"unroll={unroll}: {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
