"""Incremental DeepFM forward decomposition (differential vs ~1.1ms dispatch floor)."""
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.training import Trainer
from recommender_system_tpu.utils.datasets import synthetic_criteo
from recommender_system_tpu.utils.hashing import hash_ids
from recommender_system_tpu.layers.embedding import pack_factor
from recommender_system_tpu.ops.interactions import bi_interaction

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
    sparse_names = [c.name for c in cols if hasattr(c, "vocabulary_size")]
    dense_names = [c.name for c in cols if not hasattr(c, "vocabulary_size")]
    use_hash = any(getattr(c, "use_hash", False) for c in cols)
    print(f"sparse={len(sparse_names)} dense={len(dense_names)} hash={use_hash}")

    model = DeepFM(tuple(cols), hidden_units=HIDDEN)
    trainer = Trainer(model, optimizer=optax.adagrad(0.05))
    state = trainer.init(batch)
    p = state.params
    print(jax.tree.map(jnp.shape, p))

    d = DIM + 1
    P = pack_factor(d)
    F = len(sparse_names)
    stack = p["unified"]["embeddings"]["table_d9"]
    bias = p["unified"]["bias"]
    dense_w = p["unified"].get("dense_w")
    deep = p["deep"]

    offs = jnp.arange(F, dtype=jnp.int32) * VOCAB  # offsets per table

    def ids_resolve(batch):
        cols_ids = jnp.stack([batch[n] for n in sparse_names], axis=1)  # [B,F]
        if use_hash:
            cols_ids = hash_ids(cols_ids, VOCAB, mask_zero=True)
        cols_ids = jnp.clip(cols_ids, 0, VOCAB - 1)
        return cols_ids + offs[None, :]

    t0f = jax.jit(lambda b: ids_resolve(b).sum())
    print(f"1 ids resolve:            {timeit(t0f, batch)*1e3:8.3f} ms")

    def gath(b):
        lids = ids_resolve(b).reshape(-1)
        return jnp.take(stack, lids // P, axis=0)

    t1f = jax.jit(lambda b: gath(b).sum())
    print(f"2 +wide gather:           {timeit(t1f, batch)*1e3:8.3f} ms")

    # cross-check: gather with pre-materialized wide ids (sweep_gather2 style)
    wid_pre = jax.jit(lambda b: ids_resolve(b).reshape(-1) // P)(batch)
    wid_pre = jax.block_until_ready(wid_pre)
    t1x = jax.jit(lambda w: jnp.take(stack, w, axis=0).sum())
    print(f"2x gather pre-mat ids:    {timeit(t1x, wid_pre)*1e3:8.3f} ms")

    def sel_einsum(b):
        lids = ids_resolve(b).reshape(-1)
        wide = jnp.take(stack, lids // P, axis=0)
        ww = wide[:, : P * d].reshape(-1, P, d)
        sel = (lids % P)[:, None] == jnp.arange(P)[None, :]
        return jnp.einsum("np,npd->nd", sel.astype(wide.dtype), ww)

    t2f = jax.jit(lambda b: sel_einsum(b).sum())
    print(f"3a +select einsum:        {timeit(t2f, batch)*1e3:8.3f} ms")

    def sel_mask(b):
        lids = ids_resolve(b).reshape(-1)
        wide = jnp.take(stack, lids // P, axis=0)
        lanes = jnp.arange(P * d)
        keep = (lanes[None, :] // d) == (lids % P)[:, None]
        picked = jnp.where(keep, wide[:, : P * d], 0.0)
        return picked.reshape(-1, P, d).sum(axis=1)

    t2g = jax.jit(lambda b: sel_mask(b).sum())
    print(f"3b +select mask:          {timeit(t2g, batch)*1e3:8.3f} ms")

    def head(b, select):
        narrow = select(b).reshape(BATCH, F, d)       # [B,F,9]
        emb = narrow[..., :DIM]                       # [B,F,8]
        linear = narrow[..., -1].sum(axis=1, keepdims=True) + bias
        dense = jnp.concatenate(
            [b[n].astype(jnp.float32).reshape(BATCH, 1) for n in dense_names],
            axis=1) if dense_names else None
        if dense is not None and dense_w is not None:
            linear = linear + dense @ dense_w
        return emb, linear, dense

    def with_fm(b, select=sel_mask):
        emb, linear, dense = head(b, select)
        fm = jnp.sum(bi_interaction(emb), axis=-1, keepdims=True)
        return linear + fm

    t3f = jax.jit(lambda b: with_fm(b).sum())
    print(f"4 +linear+FM:             {timeit(t3f, batch)*1e3:8.3f} ms")

    def mlp(x):
        h = x
        for i in range(len(HIDDEN)):
            lyr = deep[f"dense_{i}"] if f"dense_{i}" in deep else None
            if lyr is None:
                return None
            h = jnp.maximum(h @ lyr["kernel"] + lyr["bias"], 0.0)
        out = deep.get("out", deep.get(f"dense_{len(HIDDEN)}"))
        return h @ out["kernel"] + out["bias"]

    def full(b, select=sel_mask):
        emb, linear, dense = head(b, select)
        fm = jnp.sum(bi_interaction(emb), axis=-1, keepdims=True)
        deep_in = emb.reshape(BATCH, -1)
        if dense is not None:
            deep_in = jnp.concatenate([deep_in, dense], axis=-1)
        dl = mlp(deep_in)
        if dl is None:
            return linear + fm
        return linear + fm + dl

    try:
        t4f = jax.jit(lambda b: full(b).sum())
        print(f"5 +deep MLP (manual):     {timeit(t4f, batch)*1e3:8.3f} ms")
    except Exception as e:
        print(f"5 manual MLP failed: {e}")
        print("deep keys:", list(deep.keys()))

    t5f = jax.jit(lambda b: model.apply({"params": p}, b, train=False).sum())
    print(f"6 model.apply:            {timeit(t5f, batch)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
