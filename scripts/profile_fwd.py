"""Piecewise timing of the DeepFM forward/backward path on TPU.

Uses the differential fetch-forced protocol (utils/benchmark.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

from recommender_system_tpu.layers.embedding import (UnifiedEmbedding,
                                                     packed_take, pack_factor)
from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.utils.benchmark import bench_fn
from recommender_system_tpu.utils.datasets import synthetic_criteo
from recommender_system_tpu.ops.embedding_grad import scatter_add_dense

BATCH = 8192
VOCAB = 100_000
DIM = 8


def main():
    cols, X, y = synthetic_criteo(n_rows=BATCH, vocab=VOCAB,
                                  embedding_dim=DIM, seed=0)
    batch = {k: jnp.asarray(v) for k, v in X.items()}
    labels = jnp.asarray(y)

    d = DIM + 1
    P = pack_factor(d)
    total = VOCAB * 26
    rows = -(-((total + P - 1) // P) // 64) * 64
    stack = jnp.zeros((rows, 128), jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, total, size=BATCH * 26,
                                          dtype=np.int32))

    t = bench_fn(jax.jit(lambda s, i: packed_take(s, i, d)), stack, ids)
    print(f"packed_take [213k ids, d=9]:     {t*1e3:8.3f} ms")

    t = bench_fn(jax.jit(lambda s, i: jnp.take(s, i // P, axis=0)), stack, ids)
    print(f"  wide take only:                {t*1e3:8.3f} ms")

    emb = UnifiedEmbedding(tuple(cols))
    vars_ = emb.init(jax.random.PRNGKey(0), batch)

    @jax.jit
    def emb_fwd(v, b):
        out, lin = emb.apply(v, b)
        return out.concat_flat(), lin

    t = bench_fn(emb_fwd, vars_, batch)
    print(f"UnifiedEmbedding fwd:            {t*1e3:8.3f} ms")

    model = DeepFM(tuple(cols), hidden_units=(256, 128, 64))
    mv = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    t = bench_fn(jax.jit(lambda v, b: model.apply(v, b, train=False)), mv, batch)
    print(f"DeepFM fwd (train=False):        {t*1e3:8.3f} ms")

    # full fwd+bwd grads
    import optax

    @jax.jit
    def fwdbwd(v, b, y_):
        def loss(p):
            logits = model.apply({"params": p["params"]}, b, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)})
            return optax.sigmoid_binary_cross_entropy(logits.ravel(), y_).mean()
        return jax.grad(loss)(v)

    t = bench_fn(fwdbwd, mv, batch, labels)
    print(f"DeepFM fwd+bwd:                  {t*1e3:8.3f} ms")

    # scatter kernel at real backward shape: wide rows, d=9... the VJP of
    # packed_take scatters [N, 128] lane-shifted cotangents into wide rows.
    @jax.jit
    def bwd(s, i, ct):
        _, vjp = jax.vjp(lambda s_: packed_take(s_, i, d), s)
        return vjp(ct)[0]

    ct = jnp.asarray(np.random.default_rng(2).normal(
        size=(BATCH * 26, d)).astype(np.float32))
    t = bench_fn(bwd, stack, ids, ct)
    print(f"packed_take VJP (scatter path):  {t*1e3:8.3f} ms")

    # adagrad sweep over the stack in isolation
    tx = optax.adagrad(0.05)
    ostate = tx.init(stack)
    g = jnp.ones_like(stack)

    @jax.jit
    def opt_step(table, ostate, g):
        up, new_o = tx.update(g, ostate, table)
        return optax.apply_updates(table, up), new_o

    t = bench_fn(opt_step, stack, ostate, g)
    print(f"dense adagrad sweep [{rows}x128]: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
