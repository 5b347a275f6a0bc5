"""Unified jit train/eval harness with throughput metering.

Replaces the reference's ``compile_fit`` (``utils/compile_fit.py:9-15``:
``tf.data`` batch + ``model.compile(SGD, bce)`` + ``model.fit``) and the one
hand-written GradientTape loop (``model/pnn.py:74-85``) with a single jitted,
donated train step that works for every model in the zoo:

- models returning logits ``[B, 1]`` (default BCE-from-logits loss),
- models returning ``(logits, aux_loss)`` (DIEN, ``model/dien.py:163-164``),
- models returning a list of per-task logits (MMOE) with label matrices,
- custom ``loss_fn(outputs, labels, batch) -> scalar`` (DSSM in-batch softmax).

Mutable batch_stats (BatchNorm/Dice) and dropout rngs are threaded through,
examples/s is metered, and evaluation streams real AUC/logloss/accuracy
(``utils.metrics`` — the reference printed accuracy mislabeled as AUC,
``model/deepFM.py:51``).
"""
from __future__ import annotations

import re
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..utils import metrics as metrics_lib
from ..utils.datasets import iter_batches, pad_to_batch
from .losses import bce_with_logits


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


@struct.dataclass
class FusedAdagrad:
    """Config for the fused sparse embedding optimizer (ops/fused_adagrad.py).

    The embedding stacks leave the optax tree entirely: their cotangents are
    captured at the lookup (flax perturb hooks) and applied in-place by the
    Pallas scatter-Adagrad kernel — no dense stack gradient, no full-table
    optimizer sweep. Semantics match ``optax.adagrad`` exactly up to one bf16
    rounding of the gradients (the same precision XLA's matmuls use).

    ``learning_rate`` may be a float or an optax-style schedule ``f(step)``.
    Sibling configs: :class:`FusedSGD`, :class:`FusedAdam` (lazy Adam).

    Checkpoint note: fused opt_state slots are stored as a dict of per-stack
    TUPLES (``(acc,)`` / ``(m, v)`` / ``()``); checkpoints written by the
    pre-2026-08-19 dict-of-arrays layout are not restorable (no shim — the
    layout changed before any long-lived checkpoints existed).
    """

    learning_rate: Any = 0.05
    eps: float = struct.field(pytree_node=False, default=1e-7)
    initial_accumulator_value: float = struct.field(
        pytree_node=False, default=0.1)

    def init_slots(self, stack):
        return (jnp.full_like(stack, self.initial_accumulator_value),)

    def apply(self, stack, slots, lids, ct, *, lr, step, **kw):
        from ..ops.fused_adagrad import fused_adagrad_apply

        new_stack, new_acc = fused_adagrad_apply(
            stack, slots[0], lids, ct, lr=lr, eps=self.eps, **kw)
        return new_stack, (new_acc,)


@struct.dataclass
class FusedSGD:
    """Fused sparse SGD: ``param[row] -= lr * grad`` applied in place per
    touched row (``ops/fused_adagrad.py fused_sgd_apply``) — the reference's
    training recipe (SGD(0.01), ``utils/compile_fit.py:12``) without a dense
    stack gradient."""

    learning_rate: Any = 0.01

    def init_slots(self, stack):
        return ()

    def apply(self, stack, slots, lids, ct, *, lr, step, **kw):
        from ..ops.fused_adagrad import fused_sgd_apply

        (new_stack,) = fused_sgd_apply(stack, lids, ct, lr=lr, **kw)
        return new_stack, ()


@struct.dataclass
class FusedAdam:
    """Fused sparse **lazy** Adam: rows with gradients this step get the
    bias-corrected Adam update; untouched rows keep stale moments (TF
    LazyAdamOptimizer semantics — a dense optax.adam would sweep the whole
    multi-million-row table every step)."""

    learning_rate: Any = 1e-3
    b1: float = struct.field(pytree_node=False, default=0.9)
    b2: float = struct.field(pytree_node=False, default=0.999)
    eps: float = struct.field(pytree_node=False, default=1e-8)

    def init_slots(self, stack):
        return (jnp.zeros_like(stack), jnp.zeros_like(stack))

    def apply(self, stack, slots, lids, ct, *, lr, step, **kw):
        from ..ops.fused_adagrad import fused_adam_apply

        new_stack, m, v = fused_adam_apply(
            stack, slots[0], slots[1], lids, ct, lr=lr, step=step,
            b1=self.b1, b2=self.b2, eps=self.eps, **kw)
        return new_stack, (m, v)


_STACK_KEY_RE = re.compile(r"^table_d(\d+)$")


def _split_stack_params(params):
    """Split a params tree into (stacks: {flat_path: arr}, rest_tree)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(flax_unfreeze(params))
    stacks = {p: v for p, v in flat.items() if _STACK_KEY_RE.match(p[-1])}
    rest = {p: v for p, v in flat.items() if p not in stacks}
    return stacks, traverse_util.unflatten_dict(rest)


def _merge_stack_params(rest_tree, stacks):
    from flax import traverse_util

    flat = traverse_util.flatten_dict(flax_unfreeze(rest_tree))
    flat.update(stacks)
    return traverse_util.unflatten_dict(flat)


def flax_unfreeze(tree):
    from flax.core import unfreeze

    return unfreeze(tree) if isinstance(tree, FrozenDict) else tree


def default_loss(outputs, labels, batch=None):
    """BCE for single-task; handles (logits, aux) tuples and per-task lists."""
    if isinstance(outputs, tuple):
        logits, aux = outputs
        return bce_with_logits(logits, labels) + aux
    if isinstance(outputs, list):
        labels = jnp.asarray(labels)
        if labels.ndim != 2 or labels.shape[-1] != len(outputs):
            raise ValueError(
                f"multi-task model with {len(outputs)} outputs needs labels "
                f"of shape [B, {len(outputs)}], got {labels.shape}")
        total = 0.0
        for t, logit in enumerate(outputs):
            total = total + bce_with_logits(logit, labels[..., t])
        return total / len(outputs)
    return bce_with_logits(outputs, labels)


class Trainer:
    """Jit-compiled training/eval driver for any flax CTR model in the zoo."""

    def __init__(
        self,
        model,
        optimizer: Optional[optax.GradientTransformation] = None,
        loss_fn: Callable = default_loss,
        seed: int = 0,
        weight_decay: float = 0.0,
        mesh=None,
        fused_embedding: Optional[FusedAdagrad] = None,
        capacity_factor: float = 2.0,
        explicit_lookup: bool = False,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — embedding stacks are
        row-sharded across all devices and batches split over the 'data' axis
        (GSPMD inserts the collectives; see ``parallel.mesh``).

        ``fused_embedding``: a :class:`FusedAdagrad` config routes embedding
        cotangents straight into the in-place Pallas scatter-Adagrad kernel
        (dense params still use ``optimizer``). Composes with ``mesh``: the
        update stream is bucketed by owner shard and exchanged with
        ``lax.all_to_all`` under ``shard_map``, then each shard runs the
        kernel on its local stack slice (``parallel.fused``).
        ``capacity_factor`` bounds the per-destination exchange buckets;
        over-capacity updates are dropped and counted in the fit history
        (``embedding_overflow``).

        ``explicit_lookup``: under a mesh, route the forward embedding
        gather through the explicit all-to-all exchange
        (``parallel.fused.alltoall_take``) instead of whatever GSPMD
        synthesizes for the sharded ``take``."""
        self.model = model
        self.mesh = mesh
        self.fused_embedding = fused_embedding
        self.capacity_factor = capacity_factor
        self.explicit_lookup = explicit_lookup
        if optimizer is None:
            optimizer = optax.adam(1e-3)
        if weight_decay:
            optimizer = optax.chain(
                optax.add_decayed_weights(weight_decay), optimizer)
        self.tx = optimizer
        self.loss_fn = loss_fn
        self.seed = seed
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------
    def init(self, sample_batch: Dict[str, np.ndarray]) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        init_rng, state_rng = jax.random.split(rng)
        batch = {k: jnp.asarray(v) for k, v in sample_batch.items()} \
            if isinstance(sample_batch, dict) else jnp.asarray(sample_batch)
        variables = self.model.init({"params": init_rng, "dropout": init_rng},
                                    batch, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        if self.fused_embedding is not None:
            stacks, rest = _split_stack_params(params)
            if not stacks:
                raise ValueError("fused_embedding set but the model has no "
                                 "embedding stacks (table_d* params)")
            slots = {p: self.fused_embedding.init_slots(v)
                     for p, v in stacks.items()}
            opt_state = (self.tx.init(rest), slots)
        else:
            opt_state = self.tx.init(params)
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state, step=jnp.int32(0), rng=state_rng)
        if self.mesh is not None:
            from ..parallel.mesh import shard_state
            # the explicit shard_map paths (fused update / explicit lookup)
            # hard-assume the 1-D P(axes, None) block layout; 2-D column
            # sharding of wide stacks is GSPMD-only (parallel.mesh._rule)
            column_sharding = (self.fused_embedding is None
                               and not self.explicit_lookup)
            state = shard_state(state, self.mesh,
                                column_sharding=column_sharding)
        return state

    def _place_batch(self, batch, labels=None):
        if self.mesh is None:
            return (batch, labels) if labels is not None else batch
        from ..parallel.mesh import batch_sharding
        sh = batch_sharding(self.mesh)
        batch = jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), batch)
        if labels is None:
            return batch
        return batch, jax.device_put(np.asarray(labels), sh)

    # ------------------------------------------------------------------
    def _make_fused_step_body(self, reorder: str = "take_first"):
        """Step body (unjitted) with the fused sparse embedding optimizer.

        The stacks never enter autodiff (their cotangents come from perturb
        hooks, ``layers/embedding.py``) and never enter optax — the Pallas
        kernel applies Adagrad in-place per touched row.
        """
        from ..layers.embedding import pack_factor
        from ..ops import dispatch
        from flax import traverse_util

        model, tx, loss_fn = self.model, self.tx, self.loss_fn
        cfg = self.fused_embedding
        mesh, capacity_factor = self.mesh, self.capacity_factor

        def _train_step(state: TrainState, batch, labels):
            step_rng = jax.random.fold_in(state.rng, state.step)
            dense_opt, slots = state.opt_state
            stacks, rest = _split_stack_params(state.params)
            has_bn = len(state.batch_stats) > 0

            def fwd(rest_p, perturbs):
                variables = {"params": _merge_stack_params(rest_p, stacks),
                             "perturbations": perturbs}
                mut = ["embed_ids", "embed_sort", "embed_overflow"]
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                    mut.append("batch_stats")
                outputs, mutated = model.apply(
                    variables, batch, train=True, mutable=mut,
                    rngs={"dropout": step_rng})
                new_stats = mutated.get("batch_stats", state.batch_stats)
                return loss_fn(outputs, labels, batch), (
                    new_stats, mutated["embed_ids"],
                    mutated.get("embed_sort", {}),
                    mutated.get("embed_overflow", {}))

            # zero perturbations with the right shapes (trace-time only)
            def _shapes(rest_p, rng):
                variables = {"params": _merge_stack_params(rest_p, stacks)}
                mut = ["embed_ids", "embed_sort", "embed_overflow",
                       "perturbations"]
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                    mut.append("batch_stats")
                return model.apply(variables, batch, train=True, mutable=mut,
                                   rngs={"dropout": rng})[1]["perturbations"]

            pert_shapes = jax.eval_shape(_shapes, rest, step_rng)
            perturbs0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                     pert_shapes)

            (loss, (new_stats, ids_tree, sort_tree, ovf_tree)), \
                (g_rest, g_pert) = \
                jax.value_and_grad(fwd, argnums=(0, 1), has_aux=True)(
                    rest, perturbs0)

            updates, new_dense_opt = tx.update(g_rest, dense_opt, rest)
            new_rest = optax.apply_updates(rest, updates)

            lr = cfg.learning_rate(state.step) \
                if callable(cfg.learning_rate) else cfg.learning_rate

            flat_ids = traverse_util.flatten_dict(flax_unfreeze(ids_tree))
            flat_ct = traverse_util.flatten_dict(flax_unfreeze(g_pert))
            # leaf at each site path is the sown (slid, order) tuple
            flat_sort = traverse_util.flatten_dict(flax_unfreeze(sort_tree))
            new_stacks, new_slots = {}, {}
            # lookup-side overflow (explicit-exchange forward, sown by
            # EmbeddingCollection) + update-side overflow below
            total_overflow = sum(
                (jnp.sum(leaf) for leaf in jax.tree.leaves(ovf_tree)),
                jnp.int32(0))
            for path, stack in stacks.items():
                scope, key = path[:-1], path[-1]
                dim = int(_STACK_KEY_RE.match(key).group(1))
                ids_list, ct_list, site_paths = [], [], []
                for ip, ids in flat_ids.items():
                    ct = flat_ct.get(ip)
                    if (ip[:len(scope)] == scope and ct is not None
                            and ct.shape[-1] == dim):
                        ids_list.append(ids.reshape(-1))
                        ct_list.append(ct.reshape(-1, dim))
                        site_paths.append(ip)
                if not ids_list:
                    new_stacks[path] = stack
                    new_slots[path] = slots[path]
                    continue
                lids = jnp.concatenate(ids_list)
                ct = jnp.concatenate(ct_list)
                stream_dtype = (jnp.bfloat16 if dispatch.on_tpu()
                                else jnp.float32)
                if mesh is not None:
                    from ..parallel.fused import sharded_fused_update

                    new_stacks[path], new_slots[path], ovf = \
                        sharded_fused_update(
                            cfg, stack, slots[path], lids, ct, mesh,
                            lr=lr, step=state.step, pack=pack_factor(dim),
                            dim=dim, stream_dtype=stream_dtype,
                            capacity_factor=capacity_factor)
                    total_overflow = total_overflow + ovf
                    continue
                presorted = None
                sites = None
                from ..ops.fused_adagrad import stream_split_rows
                if lids.shape[0] > stream_split_rows():
                    # per-site (and per-split) sorted streams keep every
                    # cotangent-reorder gather source below the measured
                    # v5e per-row cliff (~2^19 rows) — the concatenated DIEN
                    # stream paid ~11.5 ns/row instead of ~3.5 (BASELINE.md
                    # round 4, benchmarks/reorder_micro.py). Under the cliff
                    # the single concatenated stream is faster (DIN 418k:
                    # 10.1ms multi vs 8.3ms single measured), so multi is
                    # gated on TOTAL stream size, not site count.
                    sites = []
                    for k in range(len(site_paths)):
                        info = flat_sort.get(site_paths[k])
                        sites.append((ids_list[k], ct_list[k],
                                      (info[0], info[1])
                                      if info is not None else None))
                elif len(site_paths) == 1:
                    # pre-sorted stream from the lookup site (stream_sort)
                    info = flat_sort.get(site_paths[0])
                    if info is not None:
                        presorted = (info[0], info[1])
                new_stacks[path], new_slots[path] = cfg.apply(
                    stack, slots[path], lids, ct, lr=lr, step=state.step,
                    pack=pack_factor(dim), dim=dim,
                    stream_dtype=stream_dtype,
                    presorted=presorted, reorder=reorder, sites=sites)

            new_state = state.replace(
                params=_merge_stack_params(new_rest, new_stacks),
                batch_stats=new_stats,
                opt_state=(new_dense_opt, new_slots),
                step=state.step + 1)
            if mesh is not None:
                # overflow = updates dropped by the capacity-bounded exchange
                # (silent gradient loss otherwise — surfaced in fit history)
                return new_state, {"loss": loss,
                                   "embedding_overflow": total_overflow}
            return new_state, loss

        return _train_step

    # ------------------------------------------------------------------
    def _make_step_body(self, in_scan: bool = False):
        """The single-step body (state, batch, labels) -> (state, loss),
        unjitted — shared by the jitted step and the scanned multi-step.

        ``in_scan`` picks the fused optimizer's cotangent-reorder order:
        XLA compiles the reorder gather differently inside a ``lax.scan``
        body than in straight-line jit (see ``fused_adagrad_apply``)."""
        if self.fused_embedding is not None:
            return self._make_fused_step_body(
                reorder="shift_first" if in_scan else "auto")
        model, tx, loss_fn = self.model, self.tx, self.loss_fn

        def _train_step(state: TrainState, batch, labels):
            step_rng = jax.random.fold_in(state.rng, state.step)

            def compute_loss(params):
                variables = {"params": params}
                has_bn = len(state.batch_stats) > 0
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                    outputs, mutated = model.apply(
                        variables, batch, train=True,
                        mutable=["batch_stats"], rngs={"dropout": step_rng})
                    new_stats = mutated["batch_stats"]
                else:
                    outputs = model.apply(variables, batch, train=True,
                                          rngs={"dropout": step_rng})
                    new_stats = state.batch_stats
                return loss_fn(outputs, labels, batch), new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=new_params, batch_stats=new_stats,
                                      opt_state=new_opt, step=state.step + 1)
            return new_state, loss

        return _train_step

    def _with_dispatch_flags(self, fn):
        """Wrap a jitted step so trace-time dispatch globals are set: mesh
        mode (Pallas scatter is opaque to GSPMD) and fused-optimizer mode
        (perturb/sow hooks in the embedding layers)."""
        from ..ops import dispatch

        mesh, fused = self.mesh, self.fused_embedding is not None
        lookup_mesh = mesh if (self.explicit_lookup and mesh is not None) \
            else None
        capacity_factor = self.capacity_factor

        def run(*args):
            dispatch.set_mesh_mode(mesh is not None)
            dispatch.set_fused_opt_mode(fused)
            dispatch.set_lookup_mesh(lookup_mesh, capacity_factor)
            try:
                return fn(*args)
            finally:
                dispatch.set_fused_opt_mode(False)
                dispatch.set_lookup_mesh(None)

        return run

    def _make_train_step(self):
        body = self._make_step_body()
        return self._with_dispatch_flags(
            partial(jax.jit, donate_argnums=(0,))(body))

    def make_multi_step(self):
        """Jitted K-step device loop: ``(state, batches, labels) -> (state,
        losses[K])`` with batch/label leaves stacked on a leading axis.

        ``lax.scan`` keeps all K steps in ONE dispatch, amortizing the
        host->device dispatch latency (~1ms/call through the axon tunnel;
        tens of us on a local runtime) that a per-step python loop pays
        every step. The TPU-native analogue of the reference's inner
        ``model.fit`` batching loop (``utils/compile_fit.py:14``).
        """
        body = self._make_step_body(in_scan=True)

        @partial(jax.jit, donate_argnums=(0,))
        def multi(state, batches, labels):
            def scan_body(st, bl):
                b, lb = bl
                return body(st, b, lb)

            return jax.lax.scan(scan_body, state, (batches, labels))

        return self._with_dispatch_flags(multi)

    # -- packed group staging (out-of-core path) -----------------------
    # Through a high-latency host<->device link (axon tunnel: ~16ms async
    # enqueue, ~30MB/s effective; a 40-leaf criteo batch paid ~240ms/step
    # in per-leaf device_puts) the stream loop is TRANSFER-bound, not
    # device-bound. Staging K batches as ONE int32 + ONE float32 array per
    # group (+ labels) cuts 40K transfers to 3 and feeds the existing
    # lax.scan multi-step. Fewer, larger DMAs also win on real PCIe hosts.

    @staticmethod
    def _pack_spec(batch):
        """Static packing layout from a sample batch: per dtype-kind the
        ordered (name, width, trailing_shape, orig_dtype) columns."""
        spec = {"i": [], "f": []}
        for k, v in batch.items():
            v = np.asarray(v)
            kind = "i" if v.dtype.kind in "iub" else "f"
            w = int(np.prod(v.shape[1:])) if v.ndim > 1 else 1
            spec[kind].append((k, w, tuple(v.shape[1:]), str(v.dtype)))
        return {kind: feats for kind, feats in spec.items() if feats}

    @staticmethod
    def _pack_group(spec, group):
        """[(batch_dict, labels)] x K -> ({kind: [K,B,W]}, labels [K,B...]).

        Integer features are packed as int32; 64-bit ids outside int32 range
        raise instead of silently wrapping (which would diverge from the
        per-batch path — all built-in datasets emit int32, but external
        callers may not)."""
        packed = {}
        for kind, feats in spec.items():
            dt = np.int32 if kind == "i" else np.float32
            rows = []
            for xb, yb in group:
                cols = []
                for k, w, shp, _ in feats:
                    a = np.asarray(xb[k]).reshape(len(yb), -1)
                    if (kind == "i" and a.dtype.itemsize > 4 and a.size
                            and (a.max() >= 2 ** 31 or a.min() < -(2 ** 31))):
                        raise ValueError(
                            f"packed stream: feature {k!r} has {a.dtype} ids "
                            f"outside int32 range; hash/bucket them below "
                            f"2^31 or use steps_per_call=1")
                    cols.append(a.astype(dt, copy=False))
                rows.append(np.concatenate(cols, axis=1))
            packed[kind] = np.stack(rows)
        labels = np.stack([np.asarray(yb) for _, yb in group])
        return packed, labels

    def make_multi_step_packed(self, spec):
        """Jitted K-step scan over PACKED batches: ``(state, {kind:
        [K,B,W]}, labels[K,...]) -> (state, losses[K])``; features are
        re-sliced to their original shapes/dtypes inside the traced fn (free
        — XLA fuses the slices into their consumers)."""
        body = self._make_step_body(in_scan=True)

        @partial(jax.jit, donate_argnums=(0,))
        def multi(state, packed, labels):
            batches = {}
            for kind, feats in spec.items():
                arr = packed[kind]
                K, B = arr.shape[:2]
                off = 0
                for k, w, shp, dt in feats:
                    sl = jax.lax.slice_in_dim(arr, off, off + w, axis=2)
                    off += w
                    sl = sl.reshape((K, B) + shp) if shp else \
                        sl.reshape((K, B))
                    batches[k] = sl.astype(dt) if str(sl.dtype) != dt else sl

            def scan_body(st, bl):
                b, lb = bl
                return body(st, b, lb)

            return jax.lax.scan(scan_body, state, (batches, labels))

        return self._with_dispatch_flags(multi)

    def _make_eval_step(self):
        model = self.model

        @jax.jit
        def eval_step(params, batch_stats, batch):
            variables = {"params": params}
            if len(batch_stats) > 0:
                variables["batch_stats"] = batch_stats
            outputs = model.apply(variables, batch, train=False)
            if isinstance(outputs, tuple):
                outputs = outputs[0]
            if isinstance(outputs, list):
                outputs = jnp.concatenate(outputs, axis=-1)
            return outputs

        return eval_step

    # ------------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        X: Dict[str, np.ndarray],
        y: np.ndarray,
        batch_size: int = 256,
        epochs: int = 1,
        log_every: int = 0,
        shuffle: bool = True,
        steps_per_call: int = 1,
    ):
        """Train; returns (state, history dict with losses and examples/s).

        ``steps_per_call > 1`` groups that many batches into one jitted
        ``lax.scan`` dispatch (see ``make_multi_step``) — higher throughput,
        losses reported per group."""
        if self._train_step is None:
            self._train_step = self._make_train_step()
        multi = self.make_multi_step() if steps_per_call > 1 else None
        history = {"loss": [], "examples_per_sec": []}
        track_overflow = self.mesh is not None and \
            self.fused_embedding is not None

        def _split_out(out):
            """Step output is a scalar loss, or a metrics dict under the
            sharded fused optimizer (loss + embedding_overflow)."""
            if isinstance(out, dict):
                return out["loss"], out.get("embedding_overflow")
            return out, None

        for epoch in range(epochs):
            losses = []
            overflows = []
            n_examples = 0
            pending = []
            t0 = time.perf_counter()

            def flush_pending():
                nonlocal state, n_examples
                group = pending[:steps_per_call]
                del pending[:len(group)]
                if len(group) == steps_per_call and multi is not None:
                    bs = jax.tree.map(lambda *xs: jnp.stack(xs),
                                      *[g[0] for g in group])
                    ls = jnp.stack([g[1] for g in group])
                    st, group_out = multi(state, bs, ls)
                    state = st
                    gl, ovf = _split_out(group_out)
                    losses.extend(gl)
                    if ovf is not None:
                        overflows.append(jnp.sum(ovf))
                else:
                    for xb, yb in group:
                        state, out = self._train_step(state, xb, yb)
                        loss, ovf = _split_out(out)
                        losses.append(loss)
                        if ovf is not None:
                            overflows.append(ovf)
                n_examples += len(group) * batch_size

            for xb, yb in iter_batches(X, y, batch_size, shuffle=shuffle,
                                       seed=self.seed + epoch):
                xb, yb = self._place_batch(xb, yb)
                pending.append((xb, yb))
                if len(pending) >= steps_per_call:
                    flush_pending()
                if log_every and len(losses) % log_every == 0 and losses:
                    print(f"epoch {epoch} step {len(losses)} "
                          f"loss {float(losses[-1]):.4f}")
            while pending:
                flush_pending()
            # force real completion inside the timed region: block_until_ready
            # does not wait through the axon tunnel (see utils/benchmark.py);
            # fetching the LAST loss forces all prior steps (in-order device)
            if losses:
                float(losses[-1])
            dt = time.perf_counter() - t0
            epoch_loss = (float(jnp.mean(jnp.asarray(losses)))
                          if losses else 0.0)
            history["loss"].append(epoch_loss)
            history["examples_per_sec"].append(n_examples / dt)
            if track_overflow:
                history.setdefault("embedding_overflow", []).append(
                    int(jnp.sum(jnp.asarray(overflows))) if overflows else 0)
        return state, history

    def fit_stream(self, state: TrainState, batches, log_every: int = 0,
                   steps_per_call: int = 1, checkpoint_every: int = 0,
                   checkpoint_fn: Optional[Callable] = None,
                   max_steps: int = 0):
        """Train over a ``(batch_dict, labels)`` iterator (out-of-core path).

        Double-buffered host->device staging: the NEXT batch's transfer is
        issued before blocking on the current step, so host parsing
        (``utils.datasets.stream_criteo``'s background C++ chunk parser) and
        the device step overlap. Returns (state, history) like :meth:`fit`,
        with per-stream totals instead of per-epoch entries.

        ``steps_per_call > 1`` (single-device only): groups that many batches
        into ONE packed int32 + ONE packed float32 transfer and one
        ``lax.scan`` dispatch (see :meth:`make_multi_step_packed`) — the
        high-latency-link fix for the transfer-bound stream loop (measured
        42k -> device/link-bound ex/s on the axon tunnel, BASELINE.md r4).

        ``checkpoint_every`` calls ``checkpoint_fn(state, steps_done)`` every
        that many steps so a multi-hour stream run is restartable (the save
        fetches device state, stalling the stream for its duration — cadence
        accordingly). ``max_steps`` stops the stream after that many steps
        (0 = run it dry). On the packed path both act at group granularity
        (every K steps; stop may overshoot by < K).
        """
        if steps_per_call > 1 and self.mesh is None:
            return self._fit_stream_packed(state, batches, log_every,
                                           steps_per_call, checkpoint_every,
                                           checkpoint_fn, max_steps)
        if self._train_step is None:
            self._train_step = self._make_train_step()
        history = {"loss": [], "examples_per_sec": []}
        track_overflow = self.mesh is not None and \
            self.fused_embedding is not None
        losses, overflows = [], []
        n_examples = 0
        it = iter(batches)

        def stage(item):
            xb, yb = item
            if self.mesh is not None:
                return self._place_batch(xb, yb)
            # async host->device copy to the default device
            return (jax.tree.map(lambda a: jax.device_put(np.asarray(a)), xb),
                    jax.device_put(np.asarray(yb)))

        t0 = time.perf_counter()
        nxt = next(it, None)
        if nxt is not None:
            nxt = stage(nxt)
        while nxt is not None:
            xb, yb = nxt
            nxt = next(it, None)
            if nxt is not None:
                # stage the next transfer before this step's dispatch blocks
                nxt = stage(nxt)
            state, out = self._train_step(state, xb, yb)
            if isinstance(out, dict):
                losses.append(out["loss"])
                overflows.append(out.get("embedding_overflow"))
            else:
                losses.append(out)
            n_examples += int(np.asarray(
                jax.tree.leaves(yb)[0].shape[0]))
            if log_every and len(losses) % log_every == 0:
                print(f"stream step {len(losses)} "
                      f"loss {float(losses[-1]):.4f}")
            if (checkpoint_every and checkpoint_fn is not None
                    and len(losses) % checkpoint_every == 0):
                checkpoint_fn(state, len(losses))
            if max_steps and len(losses) >= max_steps:
                break
        if losses:
            float(losses[-1])  # force completion inside the timed region
        dt = time.perf_counter() - t0
        history["loss"].append(
            float(jnp.mean(jnp.asarray(losses))) if losses else 0.0)
        history["examples_per_sec"].append(n_examples / max(dt, 1e-9))
        if track_overflow and overflows:
            history["embedding_overflow"] = [
                int(jnp.sum(jnp.asarray(overflows)))]
        return state, history

    def _fit_stream_packed(self, state, batches, log_every, steps_per_call,
                           checkpoint_every: int = 0, checkpoint_fn=None,
                           max_steps: int = 0):
        """Packed-group stream loop: K batches -> 3 transfers + 1 dispatch.

        Pipelined one group deep: group n+1's transfers are enqueued
        (async ``device_put``) before group n's scan is dispatched, so the
        link and the device overlap. Batches whose leading dim differs from
        the first batch's (ragged tails, ``drop_remainder=False`` streams)
        drain the pipeline and run through the single-step path IN ORDER —
        packing requires equal shapes. The compiled packed scan is cached on
        the Trainer (one XLA compile across epochs/calls).
        """
        spec = None
        multi = None
        expected_b = None
        loss_chunks = []           # [K]-arrays, fetched once at the end
        n_examples = 0
        steps = 0
        group = []
        staged = None
        t0 = time.perf_counter()

        def stage(g):
            packed, labels = self._pack_group(spec, g)
            return ({k: jax.device_put(v) for k, v in packed.items()},
                    jax.device_put(labels))

        def dispatch(st, staged_group):
            nonlocal steps
            st, losses = multi(st, *staged_group)
            loss_chunks.append(losses)
            steps += steps_per_call
            if log_every and steps % log_every < steps_per_call:
                print(f"stream step {steps} "
                      f"loss {float(jax.tree.leaves(losses)[0][-1]):.4f}")
            if (checkpoint_every and checkpoint_fn is not None
                    and steps % checkpoint_every < steps_per_call):
                checkpoint_fn(st, steps)
            return st

        def flush_single(st, items):
            nonlocal steps
            if not items:
                return st
            if self._train_step is None:
                self._train_step = self._make_train_step()
            for xb, yb in items:
                xb = jax.tree.map(lambda a: jax.device_put(np.asarray(a)), xb)
                st, out = self._train_step(st, xb,
                                           jax.device_put(np.asarray(yb)))
                loss_chunks.append(jnp.reshape(
                    out["loss"] if isinstance(out, dict) else out, (1,)))
                steps += 1
            return st

        stopped = False
        for xb, yb in batches:
            if max_steps and steps >= max_steps:
                stopped = True  # drop staged-but-undispatched work
                break
            B = len(np.asarray(yb))
            n_examples += B
            if spec is None:
                spec = self._pack_spec(xb)
                expected_b = B
                key = tuple(sorted((kind, tuple(feats))
                                   for kind, feats in spec.items()))
                cache = getattr(self, "_packed_multi_cache", None)
                if cache is None:
                    cache = self._packed_multi_cache = {}
                multi = cache.get(key)
                if multi is None:
                    multi = cache[key] = self.make_multi_step_packed(spec)
            if B != expected_b:
                # ragged batch: preserve order — run everything pending
                # (staged group, partial group, this batch) single-step
                if staged is not None:
                    state = dispatch(state, staged)
                    staged = None
                state = flush_single(state, group + [(xb, yb)])
                group = []
                continue
            group.append((xb, yb))
            if len(group) == steps_per_call:
                nxt = stage(group)
                group = []
                if staged is not None:
                    state = dispatch(state, staged)
                staged = nxt
        if not stopped:
            if staged is not None:
                state = dispatch(state, staged)
            state = flush_single(state, group)  # tail < K batches
        history = {"loss": [], "examples_per_sec": []}
        if loss_chunks:
            flat = jnp.concatenate(
                [jnp.asarray(c) for c in loss_chunks])
            float(flat[-1])  # force completion inside the timed region
            dt = time.perf_counter() - t0
            history["loss"].append(float(jnp.mean(flat)))
            history["examples_per_sec"].append(n_examples / max(dt, 1e-9))
        return state, history

    def predict(self, state: TrainState, X, batch_size: int = 1024,
                apply_sigmoid: bool = True) -> np.ndarray:
        if self._eval_step is None:
            self._eval_step = self._make_eval_step()
        X, _, valid = pad_to_batch(X, None, batch_size)
        outs = []
        for xb in iter_batches(X, None, batch_size, shuffle=False,
                               drop_remainder=False):
            xb = self._place_batch(xb)
            out = self._eval_step(state.params, state.batch_stats, xb)
            outs.append(np.asarray(out))
        preds = np.concatenate(outs, axis=0)[valid]
        if apply_sigmoid:
            preds = 1.0 / (1.0 + np.exp(-preds))
        return preds

    def evaluate(self, state: TrainState, X, y, batch_size: int = 1024,
                 streaming: bool = False) -> Dict[str, float]:
        """Test metrics. ``streaming=True`` accumulates histogram AUC +
        logloss/accuracy per batch (O(bins) memory — for eval sets too large
        to hold all scores; exact AUC otherwise)."""
        if streaming:
            return self._evaluate_streaming(state, X, y, batch_size)
        probs = self.predict(state, X, batch_size)
        flat = probs[:, 0] if probs.ndim > 1 and probs.shape[1] == 1 else probs
        if flat.ndim == 1:
            return {
                "auc": metrics_lib.auc(y, flat),
                "logloss": metrics_lib.logloss(y, flat),
                "accuracy": metrics_lib.accuracy(y, flat),
            }
        # multi-task: metrics per column
        y = np.asarray(y)
        out = {}
        for t in range(flat.shape[1]):
            out[f"task{t}_auc"] = metrics_lib.auc(y[..., t], flat[:, t])
            out[f"task{t}_logloss"] = metrics_lib.logloss(y[..., t], flat[:, t])
        return out

    def _evaluate_streaming(self, state, X, y, batch_size):
        return self.evaluate_stream(
            state, iter_batches(X, y, batch_size, shuffle=False,
                                drop_remainder=False))

    def evaluate_stream(self, state, batches) -> Dict[str, float]:
        """Streaming metrics over a ``(batch_dict, labels)`` iterator:
        histogram AUC + logloss + accuracy in O(bins) memory.

        The single streaming-eval loop — used by both the in-memory
        ``evaluate(streaming=True)`` path and the out-of-core CLI
        (``train.run_stream --stream-eval-path``)."""
        if self._eval_step is None:
            self._eval_step = self._make_eval_step()
        stream = metrics_lib.StreamingAUC()
        ll_sum = 0.0
        correct = 0
        n = 0
        for xb, yb in batches:
            xb = self._place_batch(xb)
            logits = np.asarray(
                self._eval_step(state.params, state.batch_stats, xb)).ravel()
            yb = np.asarray(yb)
            probs = 1.0 / (1.0 + np.exp(-logits))
            stream.update(yb, probs)
            p = np.clip(probs, 1e-7, 1 - 1e-7)
            ll_sum += float(-(yb * np.log(p) + (1 - yb) * np.log(1 - p)).sum())
            correct += int(((probs >= 0.5) == (yb > 0.5)).sum())
            n += len(yb)
        return {"auc": stream.result(), "logloss": ll_sum / max(n, 1),
                "accuracy": correct / max(n, 1)}
