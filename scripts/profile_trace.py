"""Device-side HLO profile of the fused DeepFM train step (jax.profiler)."""
import collections
import glob
import gzip
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

from recommender_system_tpu.models import DeepFM
from recommender_system_tpu.training import FusedAdagrad, Trainer
from recommender_system_tpu.utils.datasets import synthetic_criteo

BATCH, VOCAB, DIM, HIDDEN = 8192, 100_000, 8, (256, 128, 64)


def main():
    fused = "--dense" not in sys.argv
    cols, X, y = synthetic_criteo(n_rows=BATCH, vocab=VOCAB,
                                  embedding_dim=DIM, seed=0)
    batch = {k: jnp.asarray(v) for k, v in X.items()}
    labels = jnp.asarray(y)
    model = DeepFM(tuple(cols), hidden_units=HIDDEN)
    tr = Trainer(model, optimizer=optax.adagrad(0.05),
                 fused_embedding=FusedAdagrad(0.05) if fused else None)
    state = tr.init(batch)
    step = tr._make_train_step()
    state, loss = step(state, batch, labels)
    float(loss)

    import shutil
    shutil.rmtree("/tmp/steptrace", ignore_errors=True)
    with jax.profiler.trace("/tmp/steptrace"):
        for _ in range(8):
            state, loss = step(state, batch, labels)
        float(loss)

    path = sorted(glob.glob("/tmp/steptrace/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pids.items() if n and "TPU" in n}
    durs = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("pid") in tpu_pids and e.get("ph") == "X":
            name = e["name"]
            if name.startswith("jit_"):
                continue  # outer XLA module event (sums everything)
            durs[name] += e.get("dur", 0)
            counts[name] += 1
            total += e.get("dur", 0)
    print(f"total device time (8 steps): {total/1e3:.3f} ms "
          f"-> {total/8e3:.3f} ms/step")
    for name, d in durs.most_common(30):
        print(f"{d/8e3:9.3f} ms/step x{counts[name]//8:<3d} {name[:95]}")


if __name__ == "__main__":
    main()
