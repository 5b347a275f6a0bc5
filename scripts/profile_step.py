"""Breakdown of the DeepFM bench step: forward / fwd+bwd / full step / scatter.

Differential timing protocol per utils/benchmark.py (axon tunnel: force fetch).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.training import Trainer
from recommender_system_tpu.utils.datasets import synthetic_criteo
from recommender_system_tpu.ops.embedding_grad import scatter_add_dense

BATCH = 8192
VOCAB = 100_000
DIM = 8
HIDDEN = (256, 128, 64)


def timeit(fn, *args, n=20, fetch=lambda out: out):
    # warmup + compile
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(fetch(out))[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(fetch(out))[0])
    return (time.perf_counter() - t0) / n


def main():
    cols, X, y = synthetic_criteo(n_rows=BATCH, vocab=VOCAB,
                                  embedding_dim=DIM, seed=0)
    batch = {k: jnp.asarray(v) for k, v in X.items()}
    labels = jnp.asarray(y)

    model = DeepFM(tuple(cols), hidden_units=HIDDEN)
    trainer = Trainer(model, optimizer=optax.adagrad(0.05))
    state = trainer.init(batch)

    # ---- forward only
    @jax.jit
    def fwd(params, batch):
        return model.apply({"params": params}, batch, train=False)

    t_fwd = timeit(fwd, state.params, batch)
    print(f"forward only:        {t_fwd*1e3:8.3f} ms")

    # ---- forward + backward (grads, no optimizer)
    @jax.jit
    def fwdbwd(params, batch, labels):
        def loss(p):
            logits = model.apply({"params": p}, batch, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)})
            return optax.sigmoid_binary_cross_entropy(
                logits.ravel(), labels).mean()
        return jax.grad(loss)(params)

    t_bwd = timeit(fwdbwd, state.params, batch, labels)
    print(f"forward+backward:    {t_bwd*1e3:8.3f} ms   (bwd ~{(t_bwd-t_fwd)*1e3:.3f})")

    # ---- grads + optimizer separately timed via full step
    step = trainer._make_train_step()

    def run_step(state):
        s, loss = step(state, batch, labels)
        return s, loss

    # cannot donate same buffers repeatedly; time with fresh state copies
    s = state
    s, _ = step(s, batch, labels)  # compile
    jax.block_until_ready(s.params)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        s, loss = step(s, batch, labels)
    float(loss)
    t_step = (time.perf_counter() - t0) / n
    print(f"full train step:     {t_step*1e3:8.3f} ms   (opt ~{(t_step-t_bwd)*1e3:.3f})")
    print(f"  -> {BATCH/t_step:,.0f} examples/s")

    # ---- scatter kernel in isolation (DeepFM unified table: dim 9, packed)
    from recommender_system_tpu.layers.embedding import pack_factor
    d = DIM + 1
    P = pack_factor(d)
    total_logical = VOCAB * 26
    wide_rows = -(-(-(-total_logical // P) // 64) * 64 // 1) * 1
    wide_rows = -(-((total_logical + P - 1) // P) // 64) * 64
    N = BATCH * 26
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, wide_rows, size=N, dtype=np.int32))
    grads = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))

    f = jax.jit(lambda i, g: scatter_add_dense(i, g, wide_rows))
    t_sc = timeit(f, ids, grads)
    print(f"scatter kernel only: {t_sc*1e3:8.3f} ms   "
          f"(N={N}, rows={wide_rows}, d=128)")

    # ---- dense adagrad sweep over the two big stacks, in isolation
    tx = optax.adagrad(0.05)
    table = jnp.zeros((wide_rows, 128), jnp.float32)
    ostate = tx.init(table)

    @jax.jit
    def opt_step(table, ostate, g):
        up, new_o = tx.update(g, ostate, table)
        return optax.apply_updates(table, up), new_o

    t_opt = timeit(opt_step, table, ostate, grads[:1].repeat(1, 0) * 0 + jnp.zeros((wide_rows, 128)))
    print(f"dense adagrad sweep: {t_opt*1e3:8.3f} ms   ({wide_rows}x128 table)")


if __name__ == "__main__":
    main()
