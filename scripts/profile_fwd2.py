"""Forward-pass decomposition for the DeepFM bench config (scalar-fetch timing).

Every timed function reduces its output to a scalar on-device so the axon
tunnel transfer is 4 bytes, not the tensor (see utils/benchmark.py timing
protocol notes).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.training import Trainer
from recommender_system_tpu.utils.datasets import synthetic_criteo
from recommender_system_tpu.layers.embedding import pack_factor

BATCH = 8192
VOCAB = 100_000
DIM = 8
HIDDEN = (256, 128, 64)


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    cols, X, y = synthetic_criteo(n_rows=BATCH, vocab=VOCAB,
                                  embedding_dim=DIM, seed=0)
    batch = {k: jnp.asarray(v) for k, v in X.items()}
    labels = jnp.asarray(y)

    model = DeepFM(tuple(cols), hidden_units=HIDDEN)
    trainer = Trainer(model, optimizer=optax.adagrad(0.05))
    state = trainer.init(batch)

    d = DIM + 1
    P = pack_factor(d)
    total_logical = VOCAB * 26
    wide_rows = -(-((total_logical + P - 1) // P) // 64) * 64
    N = BATCH * 26
    rng = np.random.default_rng(0)
    wid = jnp.asarray(rng.integers(0, wide_rows, size=N, dtype=np.int32))
    lid = jnp.asarray(
        rng.integers(0, total_logical, size=N, dtype=np.int32))
    stack = jnp.asarray(rng.normal(size=(wide_rows, 128)).astype(np.float32))

    # 1. wide gather only
    f1 = jax.jit(lambda s, i: jnp.take(s, i, axis=0).sum())
    print(f"wide gather [N,128]:      {timeit(f1, stack, wid)*1e3:8.3f} ms")

    # 2. gather + lane-select einsum (forward of packed_take)
    def pt(s, li):
        wide = jnp.take(s, li // P, axis=0)
        wide = wide[:, : P * d].reshape(-1, P, d)
        sel = (li % P)[:, None] == jnp.arange(P)[None, :]
        return jnp.einsum("np,npd->nd", sel.astype(s.dtype), wide).sum()
    f2 = jax.jit(pt)
    print(f"gather+lane select:       {timeit(f2, stack, lid)*1e3:8.3f} ms")

    # 3. full embedding front-end (UnifiedEmbedding via model internals)
    @jax.jit
    def emb_only(params, batch):
        # forward the model but stop at logits; cheapest proxy: full apply
        return model.apply({"params": params}, batch, train=False).sum()

    print(f"full model forward:       {timeit(emb_only, state.params, batch)*1e3:8.3f} ms")

    # 4. forward with train=True (dropout active)
    @jax.jit
    def fwd_train(params, batch):
        return model.apply({"params": params}, batch, train=True,
                           rngs={"dropout": jax.random.PRNGKey(0)}).sum()
    print(f"forward train=True:       {timeit(fwd_train, state.params, batch)*1e3:8.3f} ms")

    # 5. loss+grad, scalar fetch
    @jax.jit
    def fwdbwd(params, batch, labels):
        def loss(p):
            logits = model.apply({"params": p}, batch, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)})
            return optax.sigmoid_binary_cross_entropy(
                logits.ravel(), labels).mean()
        g = jax.grad(loss)(params)
        return jax.tree.reduce(lambda a, x: a + x.sum(), g, 0.0)
    print(f"fwd+bwd (grad-sum fetch): {timeit(fwdbwd, state.params, batch, labels)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
