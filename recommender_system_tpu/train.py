"""Unified training driver — the CLI the reference's 18 ``__main__`` blocks become.

Usage (mirrors the per-model drivers, e.g. ``python model/deepFM.py`` ->):

    python -m recommender_system_tpu.train --model deepfm --epochs 5
    python -m recommender_system_tpu.train --model din --dataset movielens
    python -m recommender_system_tpu.train --model dssm --dataset movielens
    python -m recommender_system_tpu.train --model mmoe --dataset synthetic
    python -m recommender_system_tpu.train --model fm --hash-buckets 100000

Loads the dataset, builds the model from ``ExperimentConfig``, runs the jit
train loop, and prints one JSON line of test metrics (real AUC/logloss —
the reference printed accuracy mislabeled as AUC, ``model/deepFM.py:51``).
Supports checkpoint/resume (orbax) and ``--profile-dir`` (jax.profiler trace).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Optional, Tuple

import numpy as np

from .config import ExperimentConfig

SEQUENCE_MODELS = {"din", "dien"}


def build_data(config: ExperimentConfig):
    """-> (columns, X_train, y_train, X_test, y_test)."""
    from .utils import datasets as D

    name = config.dataset
    if name == "synthetic_tokens" or config.model in ("lstm", "transformer"):
        rng = np.random.default_rng(config.seed)
        vocab = config.hash_buckets or 200
        n = config.max_rows or 4096
        T = max(config.seq_len, 8)
        X = rng.integers(1, vocab, (n, T)).astype(np.int32)
        y = (X % 7 == 1).any(1).astype(np.float32)  # token-presence signal
        n_test = n // 5
        return ([], X[:-n_test], y[:-n_test], X[-n_test:], y[-n_test:])
    if name == "criteo":
        try:
            return D.load_criteo(path=config.data_path,
                                 embedding_dim=config.embedding_dim,
                                 hash_buckets=config.hash_buckets,
                                 max_rows=config.max_rows)
        except FileNotFoundError:
            name = "synthetic"
    if name == "avazu":
        if not config.data_path:
            raise ValueError("--dataset avazu requires --data-path train.csv")
        return D.load_avazu(config.data_path,
                            embedding_dim=config.embedding_dim,
                            hash_buckets=config.hash_buckets or 1_000_000,
                            max_rows=config.max_rows)
    if name == "amazon":
        if not config.data_path:
            raise ValueError("--dataset amazon requires --data-path "
                             "reviews.json[.gz][,meta.json[.gz]]")
        parts = config.data_path.split(",")
        return D.build_amazon_behavior_dataset(
            parts[0], parts[1] if len(parts) > 1 else None,
            seq_len=config.seq_len, embedding_dim=config.embedding_dim,
            max_rows=config.max_rows,
            negsample_hist=(config.model == "dien"), seed=config.seed)
    if name == "movielens":
        try:
            ratings = D.load_movielens_ratings(config.data_path)
            return D.build_behavior_dataset(
                ratings, seq_len=config.seq_len,
                embedding_dim=config.embedding_dim,
                negsample=(config.model == "dien"), seed=config.seed)
        except FileNotFoundError:
            name = "synthetic_behavior"
    if name == "synthetic_behavior" or (
            name == "synthetic" and config.model in SEQUENCE_MODELS | {"dssm"}):
        cols, X, y = D.synthetic_behavior(
            n_rows=config.max_rows or 4096, seq_len=config.seq_len,
            embedding_dim=config.embedding_dim, seed=config.seed)
        if config.model == "dien":
            from .utils.features import SparseFeat, VarLenSparseFeat

            rng = np.random.default_rng(config.seed)
            n_items = next(c for c in cols
                           if c.name == "item_id").vocabulary_size
            neg = rng.integers(1, n_items,
                               X["hist_item_id"].shape).astype(np.int32)
            X["neg_hist_item_id"] = np.where(X["hist_item_id"] > 0, neg, 0)
            cols = list(cols) + [VarLenSparseFeat(
                SparseFeat("neg_hist_item_id", n_items, config.embedding_dim,
                           embedding_name="item_id"),
                maxlen=config.seq_len, combiner="mean",
                length_name="hist_len")]
    elif name == "synthetic":
        cols, X, y = D.synthetic_criteo(
            n_rows=config.max_rows or 4096,
            embedding_dim=config.embedding_dim, seed=config.seed)
    else:
        raise ValueError(f"unknown dataset {config.dataset!r}")
    if config.model == "mmoe":
        # second task (CTR+CVR-style): label correlated with dense feature sum
        dense = np.concatenate(
            [np.reshape(X[k], (len(y), -1)) for k in X
             if X[k].dtype.kind == "f"] or [np.zeros((len(y), 1))], axis=1)
        task2 = (dense.sum(1) > np.median(dense.sum(1))).astype(np.float32)
        y = np.stack([y, task2], axis=1)
    n_test = len(y) // 5
    X_train = {k: v[:-n_test] for k, v in X.items()}
    X_test = {k: v[-n_test:] for k, v in X.items()}
    return cols, X_train, y[:-n_test], X_test, y[-n_test:]


def build_model(config: ExperimentConfig, columns):
    from . import models as M

    kwargs = dict(config.model_kwargs)
    name = config.model
    if config.dnn_dtype and name not in ("lr", "cf", "mf", "lstm",
                                         "transformer", "fm", "ffm", "afm",
                                         "deep_crossing", "mmoe"):
        import jax.numpy as jnp

        kwargs.setdefault("dnn_dtype",
                          jnp.dtype(config.dnn_dtype).type
                          if config.dnn_dtype != "bfloat16" else jnp.bfloat16)
    if name == "mmoe":
        return M.MMOE(feature_columns=tuple(columns),
                      tower_hidden_units=tuple(config.hidden_units[-1:]),
                      **kwargs)
    if name == "dssm":
        from .utils.features import SparseFeat, VarLenSparseFeat

        user_cols = tuple(c for c in columns
                          if c.name in ("user_id", "hist_item_id"))
        item_cols = tuple(c for c in columns if c.name == "item_id")
        return M.DSSM(user_cols, item_cols,
                      user_hidden_units=tuple(config.hidden_units),
                      item_hidden_units=tuple(config.hidden_units), **kwargs)
    if name == "lstm":
        return M.LSTMClassifier(vocab_size=config.hash_buckets or 200,
                                embed_dim=config.embedding_dim * 4,
                                hidden=config.hidden_units[-1], **kwargs)
    if name == "transformer":
        return M.TransformerClassifier(
            vocab_size=config.hash_buckets or 200, model_dim=32, num_heads=4,
            num_layers=1, ffn_dim=64, max_len=max(config.seq_len, 8), **kwargs)
    if name not in M.CTR_MODELS:
        raise ValueError(
            f"unknown model {name!r} (choose from "
            f"{sorted(M.CTR_MODELS) + ['dssm', 'mmoe', 'lstm', 'transformer']})")
    cls = M.CTR_MODELS[name]
    if name == "dien":
        kwargs.setdefault("use_negsampling", True)
    if name in ("fm", "ffm", "afm"):
        return cls(tuple(columns), **kwargs)
    return cls(tuple(columns), hidden_units=tuple(config.hidden_units), **kwargs)


def make_loss_fn(config: ExperimentConfig):
    from .training import default_loss
    from .training.losses import inbatch_softmax_loss

    if config.model == "dssm":
        temperature = config.model_kwargs.get("temperature", 0.05)

        if config.dssm_loss == "logistic":
            import jax.numpy as jnp

            from .training.losses import bce_with_logits

            def dssm_loss(outputs, labels, batch):
                # inner-product logit vs click label (reference loss_type
                # 'logistic', model/dssm.py:73-78)
                user_emb, item_emb = outputs
                logits = jnp.sum(user_emb * item_emb, axis=-1) / temperature
                return bce_with_logits(logits, labels)
        else:
            def dssm_loss(outputs, labels, batch):
                user_emb, item_emb = outputs
                return inbatch_softmax_loss(user_emb, item_emb,
                                            batch["item_id"],
                                            temperature=temperature)
        return dssm_loss
    return default_loss


def run_stream(config: ExperimentConfig) -> dict:
    """Out-of-core path: train over ``stream_criteo`` batches (bounded RSS).

    The north-star full-Criteo config launched from the CLI:
        python -m recommender_system_tpu.train --stream --data-path train.txt \\
            --fused-embedding adagrad --batch-size 16384 --hash-buckets 1000000
    Generalizes the reference's whole-file loader (``utils/dataset.py:36-75``)
    to files that don't fit in memory.
    """
    import jax

    from .training import Trainer
    from .utils.datasets import criteo_columns, stream_criteo

    if not config.data_path:
        raise ValueError("--stream requires --data-path <criteo tsv>")
    if config.epochs < 1:
        raise ValueError(f"--stream requires --epochs >= 1, "
                         f"got {config.epochs}")
    hash_buckets = config.hash_buckets or 1_000_000
    columns = criteo_columns(embedding_dim=config.embedding_dim,
                             hash_buckets=hash_buckets)
    model = build_model(config, columns)
    fused = None
    if config.fused_embedding:
        from .training import FusedAdagrad, FusedAdam, FusedSGD

        fused = {"adagrad": FusedAdagrad, "sgd": FusedSGD,
                 "adam": FusedAdam}[config.fused_embedding](
                     config.learning_rate)
    trainer = Trainer(model, optimizer=config.build_optimizer(),
                      loss_fn=make_loss_fn(config), seed=config.seed,
                      weight_decay=config.weight_decay,
                      mesh=config.build_mesh(), fused_embedding=fused,
                      explicit_lookup=config.explicit_lookup,
                      capacity_factor=config.capacity_factor)

    def stream(path, epochs, shuffle_rows=0):
        return stream_criteo(
            path, batch_size=config.batch_size, hash_buckets=hash_buckets,
            chunk_rows=config.stream_chunk_rows, epochs=epochs,
            prefetch_chunks=config.stream_prefetch,
            shuffle_buffer_rows=shuffle_rows, seed=config.seed)

    import itertools

    # pull one batch for init, then hand the SAME generator (first batch
    # re-chained) to epoch 0 — no abandoned background parser thread
    first_stream = stream(config.data_path, 1, config.stream_shuffle_rows)
    first = next(first_stream)
    state = trainer.init(first[0])

    checkpoint_fn = None
    if config.checkpoint_dir:
        from .training.checkpoint import (latest_step, restore_checkpoint,
                                          save_checkpoint)

        if config.resume and latest_step(config.checkpoint_dir) is not None:
            state = restore_checkpoint(config.checkpoint_dir, state)
            # re-materialize through host: computations on orbax-restored
            # buffers deadlock on the axon backend
            state = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x)), state)
        if config.checkpoint_every:
            def checkpoint_fn(st, _steps):
                save_checkpoint(config.checkpoint_dir, st)

    # resume skips the rows the restored state already consumed: the stream
    # replays deterministically (same file order; the shuffle pool's RNG
    # advances identically from config.seed), so dropping the first
    # state.step batches reproduces the uninterrupted trajectory exactly.
    done_steps = int(jax.device_get(state.step))
    skip = {"batches": done_steps}

    def skipping(it):
        for item in it:
            if skip["batches"] > 0:
                skip["batches"] -= 1
                continue
            yield item

    if config.profile_dir:
        jax.profiler.start_trace(config.profile_dir)
    history = {"loss": [], "examples_per_sec": []}
    for epoch in range(config.epochs):
        epoch_stream = (itertools.chain([first], first_stream) if epoch == 0
                        else stream(config.data_path, 1,
                                    config.stream_shuffle_rows))
        remaining = (config.stream_max_steps - int(jax.device_get(state.step))
                     if config.stream_max_steps else 0)
        if config.stream_max_steps and remaining <= 0:
            break
        state, ep = trainer.fit_stream(
            state, skipping(epoch_stream), log_every=config.log_every,
            steps_per_call=config.stream_steps_per_call,
            checkpoint_every=config.checkpoint_every,
            checkpoint_fn=checkpoint_fn, max_steps=remaining)
        for k, v in ep.items():  # one entry per epoch, accumulated
            history.setdefault(k, []).extend(v)
    if config.profile_dir:
        jax.profiler.stop_trace()
    if config.checkpoint_dir:
        from .training.checkpoint import save_checkpoint

        save_checkpoint(config.checkpoint_dir, state)
    result = {
        "model": config.model,
        "train_loss": history["loss"],
        "examples_per_sec": round(float(np.mean(
            history["examples_per_sec"])), 1),
    }
    if "embedding_overflow" in history:
        result["embedding_overflow"] = history["embedding_overflow"]
    if config.stream_eval_path:
        metrics = trainer.evaluate_stream(
            state, stream(config.stream_eval_path, 1))
        result["auc"] = round(metrics["auc"], 4)
        result["logloss"] = round(metrics["logloss"], 4)
    return result


def run(config: ExperimentConfig) -> dict:
    import jax

    from .training import Trainer
    from .training.checkpoint import (latest_step, restore_checkpoint,
                                      save_checkpoint)
    from .utils.datasets import iter_batches

    if config.stream:
        return run_stream(config)
    columns, X_train, y_train, X_test, y_test = build_data(config)
    model = build_model(config, columns)
    fused = None
    if config.fused_embedding:
        from .training import FusedAdagrad, FusedAdam, FusedSGD

        fused = {"adagrad": FusedAdagrad, "sgd": FusedSGD,
                 "adam": FusedAdam}[config.fused_embedding](
                     config.learning_rate)
    trainer = Trainer(model, optimizer=config.build_optimizer(),
                      loss_fn=make_loss_fn(config), seed=config.seed,
                      weight_decay=config.weight_decay,
                      mesh=config.build_mesh(), fused_embedding=fused,
                      explicit_lookup=config.explicit_lookup,
                      capacity_factor=config.capacity_factor)
    state = trainer.init(next(iter_batches(X_train, y_train,
                                           min(config.batch_size,
                                               len(y_train))))[0])
    if config.resume and config.checkpoint_dir:
        if latest_step(config.checkpoint_dir) is not None:
            state = restore_checkpoint(config.checkpoint_dir, state)
            # re-materialize through host: computations on orbax-restored
            # buffers deadlock on the axon backend
            state = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x)), state)

    if config.profile_dir:
        jax.profiler.start_trace(config.profile_dir)
    state, history = trainer.fit(state, X_train, y_train,
                                 batch_size=config.batch_size,
                                 epochs=config.epochs,
                                 log_every=config.log_every)
    if config.profile_dir:
        jax.profiler.stop_trace()

    if config.checkpoint_dir:
        save_checkpoint(config.checkpoint_dir, state)

    result = {
        "model": config.model,
        "train_loss": history["loss"],
        "examples_per_sec": round(float(np.mean(
            history["examples_per_sec"])), 1),
    }
    if "embedding_overflow" in history:
        result["embedding_overflow"] = history["embedding_overflow"]
    if config.model == "dssm":
        from .utils.metrics import recall_at_n

        variables = {"params": state.params}
        if len(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        user_emb = model.apply(variables, X_test, method=model.user_embedding)
        item_ids = np.unique(X_test["item_id"])
        item_emb = model.apply(variables, {"item_id": item_ids},
                               method=model.item_embedding)
        scores = np.asarray(user_emb) @ np.asarray(item_emb).T
        top = item_ids[np.argsort(-scores, axis=1)[:, :10]]
        result["recall@10"] = round(
            recall_at_n(list(top), list(X_test["item_id"])), 4)
    else:
        metrics = trainer.evaluate(state, X_test, y_test)
        result.update({k: round(v, 4) for k, v in metrics.items()})
    return result


def parse_args(argv=None) -> ExperimentConfig:
    defaults = ExperimentConfig()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default=defaults.model)
    p.add_argument("--dataset", default=defaults.dataset)
    p.add_argument("--data-path", default=None)
    p.add_argument("--embedding-dim", type=int, default=defaults.embedding_dim)
    p.add_argument("--hash-buckets", type=int, default=None)
    p.add_argument("--max-rows", type=int, default=None)
    p.add_argument("--seq-len", type=int, default=defaults.seq_len)
    p.add_argument("--hidden-units", type=int, nargs="+",
                   default=list(defaults.hidden_units))
    p.add_argument("--batch-size", type=int, default=defaults.batch_size)
    p.add_argument("--epochs", type=int, default=defaults.epochs)
    p.add_argument("--learning-rate", type=float,
                   default=defaults.learning_rate)
    p.add_argument("--optimizer", default=defaults.optimizer)
    p.add_argument("--weight-decay", type=float, default=defaults.weight_decay)
    p.add_argument("--seed", type=int, default=defaults.seed)
    p.add_argument("--mesh-data", type=int, default=None)
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--explicit-lookup", action="store_true",
                   help="mesh only: explicit shard_map all-to-all embedding "
                        "lookup instead of GSPMD's synthesized gather (the "
                        "dryrun's production config)")
    p.add_argument("--capacity-factor", type=float,
                   default=defaults.capacity_factor,
                   help="mesh only: per-destination exchange bucket bound; "
                        "over-capacity updates are dropped and counted")
    p.add_argument("--fused-embedding", default=defaults.fused_embedding,
                   choices=[None, "adagrad", "sgd", "adam"],
                   help="fused sparse embedding optimizer (Pallas kernel)")
    p.add_argument("--dnn-dtype", default=defaults.dnn_dtype,
                   choices=[None, "bfloat16"],
                   help="deep-tower compute dtype (params stay f32)")
    p.add_argument("--dssm-loss", default=defaults.dssm_loss,
                   choices=["inbatch", "logistic"])
    p.add_argument("--stream", action="store_true",
                   help="out-of-core training over a criteo-format TSV "
                        "(bounded RSS; requires --data-path)")
    p.add_argument("--stream-chunk-rows", type=int,
                   default=defaults.stream_chunk_rows,
                   help="rows per parsed chunk in --stream mode")
    p.add_argument("--stream-prefetch", type=int,
                   default=defaults.stream_prefetch,
                   help="parsed chunks resident ahead of the device step")
    p.add_argument("--stream-eval-path", default=None,
                   help="held-out criteo TSV scored with streaming AUC "
                        "after --stream training")
    p.add_argument("--stream-steps-per-call", type=int,
                   default=defaults.stream_steps_per_call,
                   help="batches per packed transfer + scan dispatch in "
                        "--stream mode (1 = per-batch staging)")
    p.add_argument("--stream-shuffle-rows", type=int,
                   default=defaults.stream_shuffle_rows,
                   help="bounded shuffle pool (rows) for --stream; 0 = "
                        "strict file order (costs measured AUC vs shuffled "
                        "training — BASELINE.md)")
    p.add_argument("--stream-max-steps", type=int,
                   default=defaults.stream_max_steps,
                   help="stop --stream after N total train steps (0 = run "
                        "the stream dry)")
    p.add_argument("--checkpoint-every", type=int,
                   default=defaults.checkpoint_every,
                   help="--stream: save a checkpoint every N steps "
                        "(requires --checkpoint-dir; --resume restarts "
                        "from it, skipping consumed rows)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile-dir", default=None)
    p.add_argument("--log-every", type=int, default=0)
    args = p.parse_args(argv)
    return ExperimentConfig(
        model=args.model, dataset=args.dataset, data_path=args.data_path,
        embedding_dim=args.embedding_dim, hash_buckets=args.hash_buckets,
        max_rows=args.max_rows, seq_len=args.seq_len,
        hidden_units=tuple(args.hidden_units), batch_size=args.batch_size,
        epochs=args.epochs, learning_rate=args.learning_rate,
        optimizer=args.optimizer, weight_decay=args.weight_decay,
        seed=args.seed, dssm_loss=args.dssm_loss, dnn_dtype=args.dnn_dtype,
        fused_embedding=args.fused_embedding,
        mesh_data=args.mesh_data, mesh_model=args.mesh_model,
        explicit_lookup=args.explicit_lookup,
        capacity_factor=args.capacity_factor,
        stream=args.stream, stream_chunk_rows=args.stream_chunk_rows,
        stream_prefetch=args.stream_prefetch,
        stream_eval_path=args.stream_eval_path,
        stream_steps_per_call=args.stream_steps_per_call,
        stream_shuffle_rows=args.stream_shuffle_rows,
        stream_max_steps=args.stream_max_steps,
        checkpoint_every=args.checkpoint_every,
        checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        profile_dir=args.profile_dir, log_every=args.log_every)


def main(argv=None):
    config = parse_args(argv)
    result = run(config)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
