"""Experiment configuration: one dataclass instead of hardcoded literals.

The reference hardcodes hyperparameters in each model file's ``__main__``
(e.g. ``model/deepFM.py:35-41``, ``model/dcn.py:38-45``) and switches dataset
behavior on a model-name string (``utils/dataset.py:36,47-58``). Here a single
``ExperimentConfig`` names the model, dataset, optimizer, mesh, and model
hyperparameters explicitly; ``recommender_system_tpu.train`` turns one into a
full run (CLI: ``python -m recommender_system_tpu.train --model deepfm ...``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple


@dataclasses.dataclass
class ExperimentConfig:
    # model
    model: str = "deepfm"           # key in models.CTR_MODELS, or dssm/mmoe
    hidden_units: Tuple[int, ...] = (256, 128, 64)
    embedding_dim: int = 8
    model_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # data
    dataset: str = "criteo"         # criteo | avazu | amazon | movielens | synthetic | synthetic_behavior
    data_path: Optional[str] = None
    hash_buckets: Optional[int] = None
    max_rows: Optional[int] = None
    seq_len: int = 10

    # training
    batch_size: int = 256
    epochs: int = 5
    learning_rate: float = 1e-3
    optimizer: str = "adam"         # adam | adagrad | sgd
    weight_decay: float = 0.0
    seed: int = 0

    # dssm retrieval loss: 'inbatch' (sampled softmax w/ log-Q) or 'logistic'
    # (inner-product BCE vs labels — reference loss_type, model/dssm.py:73-78)
    dssm_loss: str = "inbatch"
    # deep-tower compute dtype: None (f32) or 'bfloat16' (params stay f32;
    # measured +8% DeepFM step on v5e at AUC parity — BASELINE.md)
    dnn_dtype: Optional[str] = None
    # fused sparse embedding optimizer (in-place Pallas scatter kernel, the
    # production path — ops/fused_adagrad.py): None | 'adagrad' | 'sgd' |
    # 'adam' (lazy). Uses learning_rate; composes with a mesh via the
    # sharded all-to-all exchange (parallel/fused.py).
    fused_embedding: Optional[str] = None

    # out-of-core streaming (criteo-format TSV only): train via
    # Trainer.fit_stream over utils.datasets.stream_criteo — bounded RSS,
    # background C++ chunk parsing. Requires data_path; hash_buckets
    # defaults to 1M. stream_eval_path: optional held-out TSV scored with
    # streaming AUC after training.
    stream: bool = False
    stream_chunk_rows: int = 1 << 18
    stream_prefetch: int = 2
    stream_eval_path: Optional[str] = None
    # batches grouped into one packed transfer + one lax.scan dispatch
    # (single-device; the transfer-bound stream-loop fix — harness.py
    # _fit_stream_packed). 1 = per-batch staging.
    stream_steps_per_call: int = 8
    # bounded shuffle pool (rows) for --stream; 0 = strict file order.
    # One-pass in-order streaming measurably loses AUC vs shuffled
    # in-memory training (BASELINE.md round 4: 0.557 vs 0.587) — the pool
    # permutation recovers the reference's free model.fit shuffle.
    stream_shuffle_rows: int = 0
    # stop the stream after this many train steps (0 = run the stream dry);
    # mainly for smoke runs and the checkpoint/resume test.
    stream_max_steps: int = 0
    # save a checkpoint every N stream steps (0 = only at the end) so a
    # multi-hour out-of-core run is restartable (--resume skips the
    # already-consumed rows) — SURVEY §5.3-4.
    checkpoint_every: int = 0

    # parallelism (None = single device)
    mesh_data: Optional[int] = None
    mesh_model: int = 1
    # mesh-only production-path knobs (ignored without a mesh): route the
    # forward embedding gather through the explicit shard_map all-to-all
    # exchange (parallel/fused.py alltoall_take) instead of GSPMD's
    # synthesized gather, and bound the per-destination exchange buckets
    # (over-capacity updates are dropped and counted in the fit history).
    explicit_lookup: bool = False
    capacity_factor: float = 2.0

    # persistence / observability
    checkpoint_dir: Optional[str] = None
    resume: bool = False
    profile_dir: Optional[str] = None
    log_every: int = 0

    def build_optimizer(self):
        import optax

        table = {
            "adam": optax.adam,
            "adagrad": optax.adagrad,
            "sgd": optax.sgd,
        }
        if self.optimizer not in table:
            raise ValueError(f"unknown optimizer {self.optimizer!r} "
                             f"(choose from {sorted(table)})")
        return table[self.optimizer](self.learning_rate)

    def build_mesh(self):
        if self.mesh_data is None:
            return None
        from .parallel.mesh import make_mesh

        return make_mesh(data=self.mesh_data, model=self.mesh_model)
