"""Device-trace bisect: what makes the in-step gather 2.2x the standalone one?"""
import collections
import glob
import gzip
import json
import shutil

import numpy as np
import jax
import jax.numpy as jnp
import optax

from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.training import FusedAdagrad, Trainer
from recommender_system_tpu.utils.datasets import synthetic_criteo
from recommender_system_tpu.utils.hashing import hash_ids

BATCH, VOCAB, DIM, HIDDEN = 8192, 100_000, 8, (256, 128, 64)
d = DIM + 1
P = 128 // d


def trace_device(tag, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    shutil.rmtree(f"/tmp/bis_{tag}", ignore_errors=True)
    with jax.profiler.trace(f"/tmp/bis_{tag}"):
        for _ in range(n):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    path = sorted(glob.glob(f"/tmp/bis_{tag}/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path) as fh:
        data = json.load(fh)
    evs = [e for e in data["traceEvents"]
           if e.get("pid") == 3 and e.get("ph") == "X" and e.get("tid") == 3]
    agg = collections.Counter()
    for e in evs:
        agg[e["name"].split(".")[0]] += e["dur"]
    top = agg.most_common(4)
    tot = sum(agg.values()) / n / 1e3
    print(f"{tag:24s} dev={tot:7.3f} ms/call  " + "  ".join(
        f"{k}={v/n/1e3:.3f}" for k, v in top))


def main():
    cols, X, y = synthetic_criteo(n_rows=BATCH, vocab=VOCAB,
                                  embedding_dim=DIM, seed=0)
    batch = {k: jnp.asarray(v) for k, v in X.items()}
    labels = jnp.asarray(y)
    sparse_names = [c.name for c in cols if hasattr(c, "vocabulary_size")]
    model = DeepFM(tuple(cols), hidden_units=HIDDEN)
    tr = Trainer(model, optimizer=optax.adagrad(0.05),
                 fused_embedding=FusedAdagrad(0.05))
    state = tr.init(batch)
    p = state.params
    offs = jnp.arange(len(sparse_names), dtype=jnp.int32) * VOCAB

    def ids_resolve(b):
        ii = jnp.stack([b[n].reshape(-1) for n in sparse_names], axis=1)
        ii = jnp.clip(ii, 0, VOCAB - 1)
        return (ii + offs[None, :]).reshape(-1)

    stack_key = ("unified", "embeddings", "table_d9")

    def get_stack(pp):
        return pp["unified"]["embeddings"]["table_d9"]

    # v1: gather alone (params dict arg)
    trace_device("v1_gather", jax.jit(
        lambda pp, b: jnp.take(get_stack(pp), ids_resolve(b) // P,
                               axis=0).sum()), p, batch)

    # v2: + select matmul
    def sel(pp, b):
        stack = get_stack(pp)
        lids = ids_resolve(b)
        wide = jax.lax.optimization_barrier(jnp.take(stack, lids // P, axis=0))
        lanes = jnp.arange(P * d)
        keep = (lanes[None, :] // d) == (lids % P)[:, None]
        picked = jnp.where(keep, wide[:, : P * d], 0)
        r_sel = (lanes[:, None] % d) == jnp.arange(d)[None, :]
        return jnp.dot(picked, r_sel.astype(stack.dtype),
                       preferred_element_type=stack.dtype,
                       precision=jax.lax.Precision.HIGHEST)

    trace_device("v2_select", jax.jit(lambda pp, b: sel(pp, b).sum()),
                 p, batch)

    # v3: forward only (model.apply)
    trace_device("v3_fwd", jax.jit(
        lambda pp, b: model.apply({"params": pp}, b, train=False).sum()),
        p, batch)

    # v4: fwd+bwd w.r.t. REST only (fused mode semantics, no optimizer)
    from recommender_system_tpu.ops import dispatch

    # v5: full fused step (reference point)
    step = tr._make_train_step()
    s = state
    s, loss = step(s, batch, labels)
    float(loss)
    shutil.rmtree("/tmp/bis_step", ignore_errors=True)
    with jax.profiler.trace("/tmp/bis_step"):
        for _ in range(5):
            s, loss = step(s, batch, labels)
        float(loss)
    path = sorted(glob.glob("/tmp/bis_step/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path) as fh:
        data = json.load(fh)
    evs = [e for e in data["traceEvents"]
           if e.get("pid") == 3 and e.get("ph") == "X" and e.get("tid") == 3]
    agg = collections.Counter()
    for e in evs:
        agg[e["name"].split(".")[0]] += e["dur"]
    tot = sum(agg.values()) / 5 / 1e3
    print(f"{'v5_full_step':24s} dev={tot:7.3f} ms/call  " + "  ".join(
        f"{k}={v/5e3:.3f}" for k, v in agg.most_common(5)))


if __name__ == "__main__":
    main()
