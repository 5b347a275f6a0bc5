"""Benchmark: DeepFM training throughput (examples/s/chip) on Criteo-shaped data.

North-star metric per BASELINE.json: examples/s/chip on Criteo DeepFM. The
reference publishes no numbers (BASELINE.md), so the recorded baseline is our
own first TPU measurement (BASELINE.md table); ``vs_baseline`` is the ratio
against it.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# Baseline: first recorded TPU v5e-1 measurement of this config (see BASELINE.md).
BASELINE_EXAMPLES_PER_SEC = 41_610_405.0  # round-1 initial measurement

BATCH_SIZE = 8192
VOCAB = 100_000
EMBED_DIM = 8
HIDDEN = (256, 128, 64)
WARMUP_STEPS = 5
MEASURE_STEPS = 30


def main():
    import optax

    from recommender_system_tpu.models import DeepFM
    from recommender_system_tpu.training import Trainer
    from recommender_system_tpu.utils.datasets import synthetic_criteo

    cols, X, y = synthetic_criteo(n_rows=BATCH_SIZE * 4, vocab=VOCAB,
                                  embedding_dim=EMBED_DIM, seed=0)
    model = DeepFM(tuple(cols), hidden_units=HIDDEN)
    trainer = Trainer(model, optimizer=optax.adagrad(0.05))
    batches = []
    for start in range(0, BATCH_SIZE * 4, BATCH_SIZE):
        xb = {k: jnp.asarray(v[start:start + BATCH_SIZE]) for k, v in X.items()}
        yb = jnp.asarray(y[start:start + BATCH_SIZE])
        batches.append((xb, yb))

    state = trainer.init(batches[0][0])
    step = trainer._make_train_step()

    for i in range(WARMUP_STEPS):
        xb, yb = batches[i % len(batches)]
        state, loss = step(state, xb, yb)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        xb, yb = batches[i % len(batches)]
        state, loss = step(state, xb, yb)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    examples_per_sec = BATCH_SIZE * MEASURE_STEPS / dt
    vs = (examples_per_sec / BASELINE_EXAMPLES_PER_SEC
          if BASELINE_EXAMPLES_PER_SEC else 1.0)
    print(json.dumps({
        "metric": "deepfm_criteo_train_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
