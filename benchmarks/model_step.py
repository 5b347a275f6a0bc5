"""Step-anatomy tool: forward / forward+backward / full-train-step timing for
any BASELINE.md model config on the real chip, with optional profiler trace.

Consolidates the round-1 one-off profiling scripts (findings recorded in
BASELINE.md). Timing uses the differential fetch-forced protocol
(``utils.benchmark``) — ``block_until_ready`` does not wait through the axon
tunnel.

Usage:
  python -m benchmarks.model_step --model dien [--batch 8192] [--trace DIR]
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0])  # force through the tunnel
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n


CRITEO_STYLE = ("deepfm", "dcn", "wide_deep", "pnn", "nfm", "afm", "ffm",
                "fnn", "deep_crossing", "mmoe")


def make_case(name: str, batch: int, dnn_dtype=None):
    """Returns (model, batch_dict, labels, loss_fn|None) at the BASELINE.md
    config for ``name``."""
    from recommender_system_tpu import models as M
    from recommender_system_tpu.models import DIEN, DIN, DSSM
    from recommender_system_tpu.utils.datasets import synthetic_criteo
    from recommender_system_tpu.utils.features import (DenseFeat, SparseFeat,
                                                       VarLenSparseFeat)

    rng = np.random.default_rng(0)
    if name in CRITEO_STYLE:
        cols, X, y = synthetic_criteo(n_rows=batch, vocab=100_000,
                                      embedding_dim=8, seed=0)
        dt = dict(dnn_dtype=dnn_dtype) if dnn_dtype is not None else {}
        makers = {
            "deepfm": lambda: M.DeepFM(tuple(cols),
                                       hidden_units=(256, 128, 64), **dt),
            "dcn": lambda: M.DCN(tuple(cols), cross_layers=6,
                                 hidden_units=(256, 128, 64), **dt),
            "wide_deep": lambda: M.WideDeep(tuple(cols),
                                            hidden_units=(256, 128, 64),
                                            **dt),
            "pnn": lambda: M.PNN(tuple(cols), mode="inner",
                                 hidden_units=(256, 128, 64), **dt),
            "nfm": lambda: M.NFM(tuple(cols), hidden_units=(256, 128, 64),
                                 **dt),
            "afm": lambda: M.AFM(tuple(cols)),
            "ffm": lambda: M.FFM(tuple(cols), factor_dim=4),
            "fnn": lambda: M.FNN(tuple(cols), hidden_units=(256, 128, 64),
                                 **dt),
            "deep_crossing": lambda: M.DeepCrossing(
                tuple(cols), hidden_units=(256, 128), num_res_blocks=3),
            "mmoe": lambda: M.MMOE(feature_columns=tuple(cols), num_tasks=2,
                                   num_experts=4, expert_units=64,
                                   tower_hidden_units=(64,)),
        }
        if name == "mmoe":
            y = np.stack([y, (y[::-1]).astype(np.float32)], axis=1)
        return makers[name](), {k: jnp.asarray(v) for k, v in X.items()}, \
            jnp.asarray(y), None

    T, V, d = 50, 200_000, 32
    cols = [
        SparseFeat("user_id", 100_000, d),
        SparseFeat("item_id", V, d, embedding_name="item_id"),
        VarLenSparseFeat(SparseFeat("hist_item_id", V, d,
                                    embedding_name="item_id"), maxlen=T),
        DenseFeat("price", 1),
    ]
    lengths = rng.integers(5, T + 1, size=batch)
    hist = rng.integers(1, V, size=(batch, T)).astype(np.int32)
    hist[np.arange(T)[None, :] >= lengths[:, None]] = 0
    X = {
        "user_id": jnp.asarray(rng.integers(1, 100_000, size=batch)),
        "item_id": jnp.asarray(rng.integers(1, V, size=batch)),
        "hist_item_id": jnp.asarray(hist),
        "price": jnp.asarray(rng.normal(size=(batch, 1)).astype(np.float32)),
    }
    y = jnp.asarray(rng.integers(0, 2, size=batch).astype(np.float32))
    if name == "din":
        return DIN(tuple(cols), behavior_feature_list=("item_id",),
                   dnn_dtype=dnn_dtype), X, y, None
    if name == "dien":
        neg = rng.integers(1, V, size=(batch, T)).astype(np.int32)
        neg[np.arange(T)[None, :] >= lengths[:, None]] = 0
        cols.append(VarLenSparseFeat(
            SparseFeat("neg_hist_item_id", V, d, embedding_name="item_id"),
            maxlen=T))
        X["neg_hist_item_id"] = jnp.asarray(neg)
        model = DIEN(tuple(cols), behavior_feature_list=("item_id",),
                     use_negsampling=True, dnn_dtype=dnn_dtype)
        return model, X, y, None
    if name == "dssm":
        from recommender_system_tpu.training.losses import inbatch_softmax_loss

        user_cols = (cols[0], cols[2])
        item_cols = (cols[1],)
        model = DSSM(user_cols, item_cols, user_hidden_units=(256, 128, 64),
                     item_hidden_units=(256, 128, 64), dnn_dtype=dnn_dtype)
        Xs = {k: X[k] for k in ("user_id", "hist_item_id", "item_id")}

        def loss_fn(outputs, labels, b):
            u, v = outputs
            return inbatch_softmax_loss(u, v, b["item_id"], temperature=0.05)

        return model, Xs, y, loss_fn
    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dien",
                    choices=list(CRITEO_STYLE) + ["din", "dien", "dssm"])
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--fused", action="store_true",
                    help="use the fused sparse optimizer in the full step")
    ap.add_argument("--dnn-dtype", default=None,
                    choices=["bfloat16", "float32"],
                    help="tower/scorer compute dtype (default: float32)")
    ap.add_argument("--step-only", action="store_true",
                    help="skip the fwd / fwd+bwd timings (one compile "
                         "instead of three — FFM's O(F^2) backward graph "
                         "takes >20 min per compile through the tunnel)")
    args = ap.parse_args()

    from recommender_system_tpu.training import FusedAdagrad, Trainer
    from recommender_system_tpu.training.harness import default_loss

    dnn_dtype = jnp.bfloat16 if args.dnn_dtype == "bfloat16" else None
    model, batch, labels, loss_fn = make_case(args.model, args.batch, dnn_dtype)
    kw = dict(loss_fn=loss_fn) if loss_fn else {}
    trainer = Trainer(model, optimizer=optax.adagrad(0.05),
                      fused_embedding=FusedAdagrad(0.05) if args.fused
                      else None, **kw)
    state = trainer.init(batch)
    lf = loss_fn or default_loss

    @jax.jit
    def fwd(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, batch, train=False)

    if not args.step_only:
        t_fwd = timeit(fwd, state.params, state.batch_stats, batch)
        print(f"forward only:     {t_fwd*1e3:8.3f} ms "
              f"({args.batch/t_fwd:,.0f} ex/s)")

    @jax.jit
    def fwdbwd(params, batch_stats, batch, labels):
        def loss(p):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
                out, _ = model.apply(
                    variables, batch, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)})
            else:
                out = model.apply(variables, batch, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(0)})
            return lf(out, labels, batch)
        return jax.grad(loss)(params)

    if not args.step_only:
        t_bwd = timeit(fwdbwd, state.params, state.batch_stats, batch,
                       labels)
        print(f"forward+backward: {t_bwd*1e3:8.3f} ms "
              f"(bwd ~{(t_bwd-t_fwd)*1e3:.3f})")

    step = trainer._make_train_step()
    s, _ = step(state, batch, labels)
    np.asarray(jax.tree.leaves(s.params)[0][:1])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        s, loss = step(s, batch, labels)
    float(jax.tree.leaves(loss)[0] if isinstance(loss, dict) else loss)
    t_step = (time.perf_counter() - t0) / n
    print(f"full train step:  {t_step*1e3:8.3f} ms   "
          f"-> {args.batch/t_step:,.0f} examples/s")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(5):
                s, loss = step(s, batch, labels)
            float(jax.tree.leaves(loss)[0]
                  if isinstance(loss, dict) else loss)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
