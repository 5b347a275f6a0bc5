"""Measure the out-of-core staging paths behind BASELINE.md round 4: per-leaf
device_put vs packed-group transfers, raw parse rate, and the packed-group
steady-state training rate.

The stream loop's bound on a high-latency host<->device link is the transfer
path, not the parser or the device step — this bench reproduces the numbers
(713k rows/s parse; ~240-330 ms/batch per-leaf vs ~11 ms async-enqueue packed;
~0.43 s per 8-batch group steady state = ~307k ex/s on the axon tunnel).

Usage:
  python -m benchmarks.gen_criteo_tsv --rows 2000000 --out /tmp/criteo_2m.tsv
  python -m benchmarks.stream_staging --data /tmp/criteo_2m.tsv
"""
import argparse
import time

import numpy as np

import jax
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/criteo_2m.tsv")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--hash-buckets", type=int, default=1_000_000)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--groups", type=int, default=20)
    args = ap.parse_args()

    from recommender_system_tpu.models import DeepFM
    from recommender_system_tpu.training import FusedAdagrad, Trainer
    from recommender_system_tpu.utils.datasets import (criteo_columns,
                                                       stream_criteo)

    # 1. raw parse+hash rate (no device work)
    t0 = time.perf_counter()
    n = 0
    for X, y in stream_criteo(args.data, batch_size=args.batch,
                              hash_buckets=args.hash_buckets):
        n += len(y)
        if n >= 1_000_000:
            break
    dt = time.perf_counter() - t0
    print(f"parse+hash only: {n/dt:,.0f} rows/s")

    it = stream_criteo(args.data, batch_size=args.batch,
                       hash_buckets=args.hash_buckets)
    X, y = next(it)

    # 2. per-leaf staging cost (the old fit_stream path)
    for tag in ("warm", "meas"):
        t0 = time.perf_counter()
        for _ in range(5):
            d = jax.tree.map(lambda a: jax.device_put(np.asarray(a)), X)
            dy = jax.device_put(y)
            np.asarray(dy)  # force through the link
        t = (time.perf_counter() - t0) / 5
    print(f"per-leaf staging: {t*1e3:,.1f} ms/batch "
          f"({len(jax.tree.leaves(X)) + 1} transfers)")

    # 3. packed-group steady state through the real Trainer path
    cols = criteo_columns(embedding_dim=8, hash_buckets=args.hash_buckets)
    tr = Trainer(DeepFM(tuple(cols)), optimizer=optax.adagrad(0.05),
                 fused_embedding=FusedAdagrad(0.05))
    state = tr.init(X)

    def groups():
        yield (X, y)
        for item in it:
            yield item

    # run fit_stream on a bounded slice, timing only post-compile groups
    K = args.group
    need = K * (args.groups + 2)

    def bounded():
        for i, item in enumerate(groups()):
            if i >= need:
                return
            yield item

    t0 = time.perf_counter()
    state, hist = tr.fit_stream(state, bounded(), steps_per_call=K)
    total = time.perf_counter() - t0
    print(f"packed fit_stream incl. compile: "
          f"{hist['examples_per_sec'][0]:,.0f} ex/s over {need} batches")

    # steady state: run again with the compiled scan cached on the Trainer
    it2 = stream_criteo(args.data, batch_size=args.batch,
                        hash_buckets=args.hash_buckets)

    def bounded2():
        for i, item in enumerate(it2):
            if i >= need:
                return
            yield item

    state, hist = tr.fit_stream(state, bounded2(), steps_per_call=K)
    print(f"packed fit_stream steady-state: "
          f"{hist['examples_per_sec'][0]:,.0f} ex/s")


if __name__ == "__main__":
    main()
