"""Benchmark: DeepFM training throughput (examples/s/chip) on Criteo-shaped data.

North-star metric per BASELINE.json: examples/s/chip on Criteo DeepFM. The
reference publishes no numbers (BASELINE.md), so the recorded baseline is our
own first *honest* TPU measurement (see BASELINE.md — the timing protocol is
differential + fetch-forced because ``block_until_ready`` does not wait
through the axon tunnel; ``utils/benchmark.py``).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json

import numpy as np

import jax
import jax.numpy as jnp

# Baseline: first honest v5e measurement of this config (round 1, 2026-08-17):
# XLA-scatter embeddings + separate linear tables ran 17.9ms/step = 0.458M ex/s.
BASELINE_EXAMPLES_PER_SEC = 458_000.0

BATCH_SIZE = 8192
VOCAB = 100_000
EMBED_DIM = 8
HIDDEN = (256, 128, 64)


def main():
    import optax

    from recommender_system_tpu.models import DeepFM
    from recommender_system_tpu.training import FusedAdagrad, Trainer
    from recommender_system_tpu.utils.benchmark import bench_train_step
    from recommender_system_tpu.utils.datasets import synthetic_criteo

    cols, X, y = synthetic_criteo(n_rows=BATCH_SIZE, vocab=VOCAB,
                                  embedding_dim=EMBED_DIM, seed=0)
    batch = {k: jnp.asarray(v) for k, v in X.items()}
    labels = jnp.asarray(y)

    model = DeepFM(tuple(cols), hidden_units=HIDDEN)
    trainer = Trainer(model, optimizer=optax.adagrad(0.05),
                      fused_embedding=FusedAdagrad(learning_rate=0.05))
    state = trainer.init(batch)
    step = trainer._make_train_step()

    best = float("inf")
    for _ in range(3):
        sec, state = bench_train_step(step, state, batch, labels)
        best = min(best, sec)

    examples_per_sec = BATCH_SIZE / best
    print(json.dumps({
        "metric": "deepfm_criteo_train_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(examples_per_sec / BASELINE_EXAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
