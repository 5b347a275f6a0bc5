"""Weak-scaling harness on a virtual device mesh (SURVEY.md north star:
"examples/s scaling measured at 1 chip / 1 host / N hosts").

Real multi-chip hardware is not available in this environment, so this is the
measurable stand-in: for n in {1, 2, 4, 8} virtual devices it runs the FULL
sharded train step (DeepFM with the sharded fused optimizer + explicit
all-to-all lookup, and DIN with varlen shared-table gradients) at a fixed
per-device batch, and reports

- wall-clock examples/s (virtual CPU devices — only the *trend* and the
  collective structure are meaningful, not the absolute number),
- the COLLECTIVE COUNTS compiled into the step HLO (all-reduce / all-to-all /
  all-gather / collective-permute / reduce-scatter) — the hardware-independent
  signal that the sharding is right: the explicit exchange should compile to a
  constant small number of all-to-alls per step, and embedding stacks should
  NOT be all-gathered around the Pallas kernel.

Run:  python -m benchmarks.scaling            (CPU, forces 8 virtual devices)
"""
import json
import os
import re
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

PER_DEVICE_BATCH = 1024
VOCAB = 4096
STEPS = 8

_COLLECTIVES = ("all-reduce", "all-to-all", "all-gather",
                "collective-permute", "reduce-scatter")


def collective_counts(hlo_text: str):
    counts = {}
    for name in _COLLECTIVES:
        # count op INSTANCES (lines like `%all-to-all.3 = ...` or fusion-less
        # `all-reduce(`), not string mentions in metadata
        counts[name] = len(re.findall(rf"= \S* ?{name}", hlo_text)) or len(
            re.findall(rf"{name}\.\d+ =", hlo_text))
    return counts


def _deepfm_case(mesh, n):
    import optax

    from recommender_system_tpu.models import DeepFM
    from recommender_system_tpu.training import FusedAdagrad, Trainer
    from recommender_system_tpu.utils.datasets import synthetic_criteo

    B = PER_DEVICE_BATCH * n
    cols, X, y = synthetic_criteo(n_rows=B, vocab=VOCAB, embedding_dim=8,
                                  seed=0)
    batch = {k: jnp.asarray(v) for k, v in X.items()}
    labels = jnp.asarray(y)
    model = DeepFM(tuple(cols), hidden_units=(64, 32))
    tr = Trainer(model, optimizer=optax.adagrad(0.05),
                 fused_embedding=FusedAdagrad(0.05), mesh=mesh,
                 capacity_factor=float(max(2, n)), explicit_lookup=True)
    return tr, batch, labels, B


def _din_batch(n):
    rng = np.random.default_rng(0)
    B, T, V = PER_DEVICE_BATCH * n, 16, VOCAB
    from recommender_system_tpu.utils.features import (DenseFeat, SparseFeat,
                                                       VarLenSparseFeat)

    cols = (
        SparseFeat("user_id", V, 8),
        SparseFeat("item_id", V, 8, embedding_name="item_id"),
        VarLenSparseFeat(SparseFeat("hist_item_id", V, 8,
                                    embedding_name="item_id"), maxlen=T),
        DenseFeat("price", 1),
    )
    batch = {
        "user_id": jnp.asarray(rng.integers(1, V, size=B)),
        "item_id": jnp.asarray(rng.integers(1, V, size=B)),
        "hist_item_id": jnp.asarray(rng.integers(0, V, size=(B, T))),
        "price": jnp.asarray(rng.normal(size=(B, 1)).astype(np.float32)),
    }
    labels = jnp.asarray(rng.integers(0, 2, size=B).astype(np.float32))
    return cols, batch, labels, B


def _din_case(mesh, n):
    from recommender_system_tpu.models import DIN
    from recommender_system_tpu.training import Trainer

    cols, batch, labels, B = _din_batch(n)
    model = DIN(cols, behavior_feature_list=("item_id",))
    tr = Trainer(model, mesh=mesh)
    return tr, batch, labels, B


def _din_fused_explicit_case(mesh, n):
    """DIN under the PRODUCTION path: fused sparse optimizer + explicit
    lookup — multi-site shared-table cotangents ([B,T] hist + [B] item)
    through sharded_fused_update (VERDICT r2 #3)."""
    import optax

    from recommender_system_tpu.models import DIN
    from recommender_system_tpu.training import FusedAdagrad, Trainer

    cols, batch, labels, B = _din_batch(n)
    model = DIN(cols, behavior_feature_list=("item_id",))
    tr = Trainer(model, optimizer=optax.adagrad(0.05),
                 fused_embedding=FusedAdagrad(0.05), mesh=mesh,
                 capacity_factor=float(max(2, n)), explicit_lookup=True)
    return tr, batch, labels, B


def _dien_fused_explicit_case(mesh, n):
    """DIEN under the PRODUCTION path: 3 lookup sites (query + hist + neg
    hist) through ONE shared stack, GRU/AUGRU scans, aux loss — the deepest
    cotangent stream in the zoo through sharded_fused_update, including the
    per-shard position-chunk split when the received stream would cross the
    gather cliff (VERDICT r4 #3)."""
    import optax

    from recommender_system_tpu.models import DIEN
    from recommender_system_tpu.training import FusedAdagrad, Trainer
    from recommender_system_tpu.utils.features import (SparseFeat,
                                                       VarLenSparseFeat)

    cols, batch, labels, B = _din_batch(n)
    T, V = 16, VOCAB
    cols = cols + (VarLenSparseFeat(
        SparseFeat("neg_hist_item_id", V, 8, embedding_name="item_id"),
        maxlen=T),)
    rng = np.random.default_rng(1)
    hist = np.asarray(batch["hist_item_id"])
    batch = dict(batch)
    batch["neg_hist_item_id"] = jnp.asarray(np.where(
        hist > 0, rng.integers(1, V, size=hist.shape), 0).astype(np.int32))
    model = DIEN(cols, behavior_feature_list=("item_id",),
                 use_negsampling=True, hidden_units=(64, 32))
    tr = Trainer(model, optimizer=optax.adagrad(0.05),
                 fused_embedding=FusedAdagrad(0.05), mesh=mesh,
                 capacity_factor=float(max(2, n)), explicit_lookup=True)
    return tr, batch, labels, B


def _dssm_explicit_dense_case(mesh, n):
    """DSSM with explicit_lookup under DENSE optax: the census covers the
    *gradient* of alltoall_take (AD transposes the two all_to_alls + a
    fill-gather into a scatter-add on the owning shard) — asserting the
    compiled backward does not densify the stacks (VERDICT r2 #10)."""
    from recommender_system_tpu.models import DSSM
    from recommender_system_tpu.training import Trainer
    from recommender_system_tpu.training.losses import inbatch_softmax_loss

    cols, batch, labels, B = _din_batch(n)
    user_cols = (cols[0], cols[2])
    item_cols = (cols[1],)
    model = DSSM(user_cols, item_cols, user_hidden_units=(64, 32),
                 item_hidden_units=(64, 32))
    bat = {k: batch[k] for k in ("user_id", "hist_item_id", "item_id")}

    def loss_fn(outputs, labels, b):
        u, v = outputs
        return inbatch_softmax_loss(u, v, b["item_id"], temperature=0.05)

    tr = Trainer(model, loss_fn=loss_fn, mesh=mesh,
                 capacity_factor=float(max(2, n)), explicit_lookup=True)
    return tr, bat, labels, B


def stack_allgather_shapes(hlo_text: str, min_rows: int):
    """f32/bf16 all-gather output shapes whose leading dim reaches
    ``min_rows`` — evidence a full embedding stack is being densified.
    (s32 id-stream all-gathers are resharding of [B]-sized index vectors,
    not table rows, and are excluded.)"""
    bad = []
    for m in re.finditer(r"= (?:f32|bf16)\[(\d+)(?:,\d+)*\]\S* all-gather",
                         hlo_text):
        if int(m.group(1)) >= min_rows:
            bad.append(m.group(0))
    return bad


def run_case(name, make_case, n):
    from recommender_system_tpu.parallel.mesh import make_mesh, shard_batch

    devices = jax.devices()[:n]
    model_axis = 2 if n >= 2 else 1
    mesh = make_mesh(data=n // model_axis, model=model_axis, devices=devices)
    tr, batch, labels, B = make_case(mesh, n)
    state = tr.init(batch)
    batch = shard_batch(batch, mesh)
    labels = shard_batch(labels, mesh)
    step = tr._make_train_step()

    # collective census of the compiled step (same trace-time dispatch flags
    # the Trainer sets, but without donation so we can lower separately)
    from recommender_system_tpu.ops import dispatch

    dispatch.set_mesh_mode(True)
    dispatch.set_fused_opt_mode(tr.fused_embedding is not None)
    dispatch.set_lookup_mesh(mesh if tr.explicit_lookup else None,
                             tr.capacity_factor)
    try:
        hlo = jax.jit(tr._make_step_body()).lower(
            state, batch, labels).compile().as_text()
    finally:
        dispatch.set_mesh_mode(False)
        dispatch.set_fused_opt_mode(False)
        dispatch.set_lookup_mesh(None)
    counts = {k: v for k, v in collective_counts(hlo).items() if v}
    # any full-stack all-gather (leading dim >= the smallest stack's rows)
    # means GSPMD is densifying a table — the thing the explicit paths exist
    # to prevent
    min_stack_rows = min(
        (v.shape[0] for p, v in jax.tree_util.tree_leaves_with_path(
            state.params) if "table_d" in jax.tree_util.keystr(p)),
        default=1 << 30)
    stack_ags = stack_allgather_shapes(hlo, min_stack_rows)

    state, _ = step(state, batch, labels)  # compile via Trainer path
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, out = step(state, batch, labels)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / STEPS
    # wall-clock on INTERPRETED-Pallas virtual CPU devices is meaningless
    # (VERDICT r4 weak #4: a consumer read a 200x "scaling collapse" out of
    # it) — keep it only under an explicit caveat key; the collective
    # counts are the artifact's real content.
    return {"model": name, "n_devices": n, "batch": B,
            "collectives": counts, "stack_allgathers": stack_ags,
            "virtual_cpu_examples_per_sec": round(B / dt, 1),
            "wallclock_meaningless": True}


def main(out_path=None):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    results = []
    for name, case in (("deepfm_fused_explicit", _deepfm_case),
                       ("din", _din_case),
                       ("din_fused_explicit", _din_fused_explicit_case),
                       ("dien_fused_explicit", _dien_fused_explicit_case),
                       ("dssm_explicit_dense", _dssm_explicit_dense_case)):
        for n in (1, 2, 4, 8):
            r = run_case(name, case, n)
            results.append(r)
            print(json.dumps(r))
    summary = {"summary": [
        {k: r[k] for k in ("model", "n_devices", "collectives")}
        for r in results],
        "any_stack_allgather": any(r["stack_allgathers"] for r in results),
        "note": ("collective counts are compiled-HLO structure (hardware-"
                 "independent); wall-clock fields come from interpreted-"
                 "Pallas virtual CPU devices and carry NO performance "
                 "signal — see BASELINE.md for real-chip numbers")}
    print(json.dumps(summary))
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"results": results, **summary}, f, indent=1)


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else None)
