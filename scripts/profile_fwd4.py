"""DeepFM step decomposition with params as EXPLICIT jit args.

(Closure-captured device arrays gather ~2x slower — measured sweep_gather3b —
so every timed fn takes params explicitly, like the real train step.)
Dispatch floor through the axon tunnel is ~1.05ms; differentials matter.
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
from recommender_system_tpu.ops.interactions import bi_interaction

BATCH = 8192
VOCAB = 100_000
DIM = 8
HIDDEN = (256, 128, 64)
d = DIM + 1
P = pack_factor(d)
F = 26


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
    sparse_names = [c.name for c in cols if hasattr(c, "vocabulary_size")]
    dense_names = [c.name for c in cols if not hasattr(c, "vocabulary_size")]

    model = DeepFM(tuple(cols), hidden_units=HIDDEN)
    trainer = Trainer(model, optimizer=optax.adagrad(0.05))
    state = trainer.init(batch)
    p = state.params

    offs = jnp.arange(F, dtype=jnp.int32) * VOCAB

    def ids_resolve(b):
        ii = jnp.stack([b[n].reshape(-1) for n in sparse_names], axis=1)
        ii = jnp.clip(ii, 0, VOCAB - 1)
        return (ii + offs[None, :]).reshape(-1)

    floor = jax.jit(lambda b: b[sparse_names[0]].sum())
    print(f"0 dispatch floor:        {timeit(floor, batch)*1e3:8.3f} ms")

    f1 = jax.jit(lambda p, b: jnp.take(
        p["unified"]["embeddings"]["table_d9"], ids_resolve(b) // P,
        axis=0).sum())
    print(f"1 ids+gather:            {timeit(f1, p, batch)*1e3:8.3f} ms")

    def sel_einsum(stack, lids):
        wide = jnp.take(stack, lids // P, axis=0)
        ww = wide[:, : P * d].reshape(-1, P, d)
        sel = (lids % P)[:, None] == jnp.arange(P)[None, :]
        return jnp.einsum("np,npd->nd", sel.astype(wide.dtype), ww)

    def sel_mask(stack, lids):
        wide = jnp.take(stack, lids // P, axis=0)
        lanes = jnp.arange(P * d)
        keep = (lanes[None, :] // d) == (lids % P)[:, None]
        picked = jnp.where(keep, wide[:, : P * d], 0.0)
        return picked.reshape(-1, P, d).sum(axis=1)

    f2a = jax.jit(lambda p, b: sel_einsum(
        p["unified"]["embeddings"]["table_d9"], ids_resolve(b)).sum())
    f2b = jax.jit(lambda p, b: sel_mask(
        p["unified"]["embeddings"]["table_d9"], ids_resolve(b)).sum())
    print(f"2a +select einsum:       {timeit(f2a, p, batch)*1e3:8.3f} ms")
    print(f"2b +select mask:         {timeit(f2b, p, batch)*1e3:8.3f} ms")

    def fwd_manual(p, b, select):
        stack = p["unified"]["embeddings"]["table_d9"]
        narrow = select(stack, ids_resolve(b)).reshape(BATCH, F, d)
        emb = narrow[..., :DIM]
        linear = narrow[..., -1].sum(axis=1, keepdims=True) + p["unified"]["bias"]
        dense = jnp.concatenate(
            [b[n].astype(jnp.float32).reshape(BATCH, 1) for n in dense_names], 1)
        linear = linear + dense @ p["unified"]["dense_w"]
        fm = jnp.sum(bi_interaction(emb), axis=-1, keepdims=True)
        h = jnp.concatenate([emb.reshape(BATCH, -1), dense], axis=-1)
        dp = p["deep"]
        for i in range(len(HIDDEN)):
            lyr = dp[f"dense_{i}"]
            h = jnp.maximum(h @ lyr["kernel"] + lyr["bias"], 0.0)
        out = dp["output"]
        return linear + fm + h @ out["kernel"] + out["bias"]

    f3a = jax.jit(lambda p, b: fwd_manual(p, b, sel_einsum).sum())
    f3b = jax.jit(lambda p, b: fwd_manual(p, b, sel_mask).sum())
    print(f"3a full fwd einsum:      {timeit(f3a, p, batch)*1e3:8.3f} ms")
    print(f"3b full fwd mask:        {timeit(f3b, p, batch)*1e3:8.3f} ms")

    f4 = jax.jit(lambda p, b: model.apply({"params": p}, b, train=False).sum())
    print(f"4 model.apply:           {timeit(f4, p, batch)*1e3:8.3f} ms")
    # sanity: manual == model
    a = np.asarray(jax.jit(lambda p, b: fwd_manual(p, b, sel_einsum))(p, batch))
    m = np.asarray(jax.jit(
        lambda p, b: model.apply({"params": p}, b, train=False))(p, batch))
    print(f"  manual-vs-model max|diff| = {np.abs(a - m).max():.2e}")

    # backward pieces
    def loss_manual(p, b, y, select):
        logits = fwd_manual(p, b, select)
        return optax.sigmoid_binary_cross_entropy(logits.ravel(), y).mean()

    g5a = jax.jit(lambda p, b, y: jax.tree.reduce(
        lambda a, x: a + x.sum(),
        jax.grad(lambda pp: loss_manual(pp, b, y, sel_einsum))(p), 0.0))
    g5b = jax.jit(lambda p, b, y: jax.tree.reduce(
        lambda a, x: a + x.sum(),
        jax.grad(lambda pp: loss_manual(pp, b, y, sel_mask))(p), 0.0))
    print(f"5a fwd+bwd einsum(XLA):  {timeit(g5a, p, batch, labels)*1e3:8.3f} ms")
    print(f"5b fwd+bwd mask (XLA):   {timeit(g5b, p, batch, labels)*1e3:8.3f} ms")

    # with the pallas work-queue scatter backward (packed_take_fast)
    from recommender_system_tpu.ops.embedding_grad import packed_take_fast

    def sel_fast(stack, lids):
        return packed_take_fast(stack, lids, P, d)

    g5c = jax.jit(lambda p, b, y: jax.tree.reduce(
        lambda a, x: a + x.sum(),
        jax.grad(lambda pp: loss_manual(pp, b, y, sel_fast))(p), 0.0))
    print(f"5c fwd+bwd pallas-queue: {timeit(g5c, p, batch, labels)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
