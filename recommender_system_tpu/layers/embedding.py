"""Fused embedding engine: stacked tables, shared names, hashing, varlen pooling.

TPU-native redesign of the reference's embedding subsystem
(``utils/inputs.py:22-153`` ``create_embedding_dict`` / ``embedding_lookup`` /
``get_varlen_pooling_list`` and ``EmbedLayer`` ``layer/core.py:267-280``):

Instead of one ``Embedding`` layer per feature (26 small gathers for Criteo), all
tables that share an embedding dim are **stacked into one ``[total_rows, dim]``
array** with static per-table row offsets. A batch's single-valued sparse features
of that dim become one ``[B, F]`` id matrix + offset vector -> **one gather**. This
is the layout that row-shards cleanly across a device mesh (see
``parallel/embedding.py``) and keeps HBM reads coalesced.

Capability parity:
- shared tables via ``embedding_name`` (same name -> same offset; DIEN's query /
  history sharing, ``model/dien.py:180-183``)
- ``use_hash`` -> on-device murmur hash into the vocab (``layer/utils.py:21-65``)
- ``trainable=False`` -> stop_gradient on the gathered slice
- mask-zero semantics: row 0 of every table is the padding row
- varlen pooling sum/mean/max with optional per-position weights + normalization
  (``layer/sequence.py:21-175``)
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.seqpool import id_mask, length_mask, sequence_pooling, weighted_sequence
from ..utils.features import (DenseFeat, FeatureColumn, SparseFeat,
                              VarLenSparseFeat, split_columns)
from ..utils.hashing import hash_ids


@dataclasses.dataclass
class _TableSpec:
    name: str
    vocab: int
    dim: int
    init_std: float
    trainable: bool
    offset: int = 0


def build_table_specs(feature_columns: Sequence[FeatureColumn]) -> Dict[int, Dict[str, _TableSpec]]:
    """Unique tables grouped by dim, with row offsets into the per-dim stack."""
    by_dim: Dict[int, Dict[str, _TableSpec]] = {}
    for fc in feature_columns:
        if isinstance(fc, DenseFeat):
            continue
        name = fc.embedding_name
        group = by_dim.setdefault(fc.embedding_dim, {})
        if name in group:
            # Shared table: vocab must agree (max wins, tolerant like the
            # reference's dict overwrite at utils/inputs.py:39-41).
            group[name].vocab = max(group[name].vocab, fc.vocabulary_size)
        else:
            group[name] = _TableSpec(name, fc.vocabulary_size, fc.embedding_dim,
                                     fc.init_std, fc.trainable)
    for dim, group in by_dim.items():
        offset = 0
        for spec in group.values():
            spec.offset = offset
            offset += spec.vocab
    return by_dim


@dataclasses.dataclass
class EmbedOutputs:
    """Everything a model needs from the feature pipeline for one batch.

    ``fused`` holds the pre-split per-dim-group lookup results
    (``names -> [B, F, d]``); ``sparse_stack``/``concat_flat`` consume it
    directly so the common "stack all fields" path never round-trips through
    26 per-feature slices + re-concat (measured ~0.9 ms/step at batch 8192
    on v5e — XLA does not fully fuse the split/restack chain)."""

    sparse: Dict[str, jax.Array]        # name -> [B, d]
    varlen_raw: Dict[str, jax.Array]    # name -> [B, T, d] (pre-pooling)
    varlen_mask: Dict[str, jax.Array]   # name -> [B, T] bool
    pooled: Dict[str, jax.Array]        # name -> [B, d]
    dense: Optional[jax.Array]          # [B, sum(dims)] or None
    fused: Dict[int, Tuple[Tuple[str, ...], jax.Array]] = \
        dataclasses.field(default_factory=dict)  # dim -> (names, [B, F, d])

    def sparse_stack(self, names: Optional[Sequence[str]] = None) -> jax.Array:
        """Stack single-valued sparse embeddings into [B, F, d] (uniform dim)."""
        if names is None and len(self.fused) == 1:
            (fnames, arr), = self.fused.values()
            if len(fnames) == len(self.sparse):
                return arr
        vals = [self.sparse[n] for n in (names or self.sparse.keys())]
        return jnp.stack(vals, axis=1)

    def concat_flat(self, include_dense: bool = True,
                    sparse_names: Optional[Sequence[str]] = None) -> jax.Array:
        """Flattened [sparse embeds | pooled varlen | dense] — the
        ``combined_dnn_input`` idiom (``layer/utils.py:140-150``)."""
        if sparse_names is None and len(self.fused) == 1 and not self.pooled:
            (fnames, arr), = self.fused.values()
            if len(fnames) == len(self.sparse):
                parts = [arr.reshape(arr.shape[0], -1)]
                if include_dense and self.dense is not None:
                    parts.append(self.dense)
                return jnp.concatenate(parts, axis=-1)
        parts = [self.sparse[n] for n in (sparse_names or self.sparse.keys())]
        parts += list(self.pooled.values())
        if include_dense and self.dense is not None:
            parts.append(self.dense)
        return jnp.concatenate(parts, axis=-1) if parts else None


def pack_factor(dim: int) -> int:
    """Rows packed per 128-lane row (lane-packed storage; 1 = unpacked)."""
    return max(128 // dim, 1) if dim <= 128 else 1


def packed_take(stack: jax.Array, rows: jax.Array, dim: int) -> jax.Array:
    """Gather rows from a lane-packed ``[ceil(V/P), 128]`` stack -> ``[N, dim]``.

    Forward: one wide (512B-aligned) row gather + an einsum lane-select.
    Backward (autodiff): the einsum transposes to a lane-shift and the gather
    to a scatter-add over *wide* rows — measured on v5e (V=2.6M, d=8,
    N=213k): gather 802us vs 1085us narrow; scatter-add 3.2ms vs 18.7ms
    narrow (XLA's scatter loop pays the (8,128)-tile padding per index, so
    narrow rows waste 16x; packed rows don't).
    """
    from ..ops import dispatch
    from ..ops.embedding_grad import _packed_take_impl, packed_take_fast

    P = pack_factor(dim)
    if dispatch.lookup_mesh() is not None:
        return packed_take_exchange(stack, rows, dim,
                                    dispatch.lookup_mesh(),
                                    dispatch.lookup_capacity())[0]
    if dispatch.fast_scatter():
        return packed_take_fast(stack, rows, P, dim)
    # shared forward math: row gather + lane select (XLA output-fuses the
    # select into the gather) — see ops/embedding_grad.py for measurements
    return _packed_take_impl(stack, rows, P, dim)


def packed_take_exchange(stack: jax.Array, rows: jax.Array, dim: int, mesh,
                         capacity_factor: float = 2.0):
    """Lane-packed gather through the explicit all-to-all exchange
    (``parallel.fused.alltoall_take``): wide rows are fetched from their
    owner shards under ``shard_map``, then lane-selected locally.

    Returns ``([N, dim], overflow_count)`` — over-capacity ids resolve to
    zero vectors and are counted. The TPU-native in-model counterpart of the
    reference's ``embedding_lookup`` (``utils/inputs.py:59-89``) for
    mesh-sharded tables.
    """
    from ..ops.embedding_grad import lane_select
    from ..parallel.fused import alltoall_take

    P = pack_factor(dim)
    wids = (rows // P if P > 1 else rows).astype(jnp.int32)
    N = wids.shape[0]
    n = mesh.devices.size
    rem = (-N) % n
    if rem:
        # pad with out-of-range ids (owner >= n -> never routed, zero rows)
        wids = jnp.concatenate(
            [wids, jnp.full((rem,), jnp.int32(2 ** 30))])
    wide, overflow = alltoall_take(stack, wids, mesh,
                                   capacity_factor=capacity_factor)
    wide = wide[:N]
    if P > 1:
        return lane_select(wide, rows % P, P, dim), overflow
    return wide[:, :dim], overflow


def _stack_initializer(table_ranges, dim: int):
    """Per-table init std inside one shared stack: draws unit normals for the
    whole (lane-packed) stack and scales each table's logical row range by its
    own ``init_std`` (tables with different stds share a stack; taking one
    global std would silently override the per-column setting)."""

    def init(key, shape, dtype=jnp.float32):
        import numpy as np

        base = jax.random.normal(key, shape, dtype)
        P = pack_factor(dim)
        logical_rows = shape[0] * P if P > 1 else shape[0]
        std_per_row = np.zeros((logical_rows,), np.float32)
        for offset, vocab, std in table_ranges:
            std_per_row[offset: offset + vocab] = std
        if P > 1:
            # expand to lane space: logical row r -> packed row r//P, lanes
            # [(r%P)*dim, (r%P+1)*dim); unused tail lanes get std 0
            std_cols = np.zeros((shape[0], shape[1]), np.float32)
            packed = np.zeros((shape[0] * P, dim), np.float32)
            packed[:logical_rows] = std_per_row[:, None]
            std_cols[:, : P * dim] = packed.reshape(shape[0], P * dim)
            return base * jnp.asarray(std_cols)
        return base * jnp.asarray(std_per_row[:, None])

    return init


def unpack_stack(stack: jax.Array, total_rows: int, dim: int) -> jax.Array:
    """Lane-packed ``[ceil(V/P), 128]`` -> logical ``[total_rows, dim]`` view
    (for tests/inspection/export)."""
    P = pack_factor(dim)
    if P == 1:
        return stack[:total_rows]
    return stack[:, : P * dim].reshape(-1, dim)[:total_rows]


def pack_stack(logical: jax.Array, dim: int,
               rows: Optional[int] = None) -> jax.Array:
    """Inverse of ``unpack_stack``: ``[V, dim]`` -> lane-packed stack
    (``rows`` pads to a target physical row count, e.g. a param's shape)."""
    P = pack_factor(dim)
    V = logical.shape[0]
    if P == 1:
        out_rows = rows if rows is not None else V
        return jnp.concatenate(
            [logical, jnp.zeros((out_rows - V, dim), logical.dtype)])
    out_rows = rows if rows is not None else -(-V // P)
    flat = jnp.concatenate(
        [logical, jnp.zeros((out_rows * P - V, dim), logical.dtype)]).reshape(
            out_rows, P * dim)
    if P * dim < 128:
        flat = jnp.pad(flat, ((0, 0), (0, 128 - P * dim)))
    return flat


class EmbeddingCollection(nn.Module):
    """The fused lookup front-end (see module docstring).

    Storage is **lane-packed**: a dim-d stack keeps ``P = 128 // d`` logical
    rows per physical 128-lane row, so every HBM row touch moves a full
    512-byte transaction and XLA's scatter/gather never pays sublane padding
    (see ``packed_take``).
    """

    feature_columns: Tuple[FeatureColumn, ...]

    def setup(self):
        cols = self.feature_columns
        self._sparse_cols, self._varlen_cols, self._dense_cols = split_columns(cols)
        self._specs = build_table_specs(cols)
        stacks = {}
        for dim, group in self._specs.items():
            total = sum(s.vocab for s in group.values())
            P = pack_factor(dim)
            # round rows up to a multiple of 512 so the stack (a) row-shards
            # cleanly across any mesh up to 64 devices and (b) tiles evenly
            # into the fused-optimizer kernel's preferred 512-row subtiles
            if P > 1:
                rows = -(-((total + P - 1) // P) // 512) * 512
                shape = (rows, 128)
            else:
                shape = (-(-total // 512) * 512, dim)
            stacks[dim] = self.param(
                f"table_d{dim}",
                _stack_initializer(tuple(
                    (s.offset, s.vocab, s.init_std) for s in group.values()),
                    dim),
                shape,
            )
        self._stacks = stacks

    def _resolve_ids(self, fc, ids: jax.Array) -> jax.Array:
        spec = self._specs[fc.embedding_dim][fc.embedding_name]
        # an explicit vocabulary file (applied host-side by utils.vocab) takes
        # precedence over hashing — reference Hash semantics, layer/utils.py:48-64
        base = fc.sparsefeat if hasattr(fc, "sparsefeat") else fc
        if fc.use_hash and not getattr(base, "vocabulary_path", None):
            ids = hash_ids(ids, spec.vocab, mask_zero=True)
        ids = jnp.clip(ids, 0, spec.vocab - 1)
        return ids + spec.offset

    def _gather(self, dim: int, rows_flat: jax.Array) -> jax.Array:
        """One stack gather; under explicit-exchange mesh mode the lookup
        goes through the all-to-all and its overflow count is sown
        (collection ``embed_overflow`` — the Trainer surfaces it)."""
        from ..ops import dispatch

        mesh = dispatch.lookup_mesh()
        if mesh is not None:
            out, ovf = packed_take_exchange(
                self._stacks[dim], rows_flat, dim, mesh,
                dispatch.lookup_capacity())
            self.sow("embed_overflow", f"d{dim}", ovf,
                     reduce_fn=lambda a, b: a + b,
                     init_fn=lambda: jnp.int32(0))
            return out
        return packed_take(self._stacks[dim], rows_flat, dim)

    def _take(self, fc, rows: jax.Array) -> jax.Array:
        from ..ops import dispatch

        dim = fc.embedding_dim
        # NOTE (negative result, 2026-08-21): selecting AFTER a [B,T,128]
        # reshape so the lane-select dot emits the sequence shape directly
        # (ops/embedding_grad.packed_take_fast_nd) looked like it would
        # delete the 1.2 ms [N,32]->[B,T,32] relayout the DIN trace shows
        # (reshape.37 + copy.102) — instead the 3-D select dot made XLA
        # re-layout the gather feeding it: DIN step 9.84 -> 13.66 ms. The
        # flat gather + reshape stays.
        out = self._gather(dim, rows.reshape(-1))
        out = out.reshape(rows.shape + (dim,))
        if dispatch.fused_opt_mode() and fc.trainable:
            # fused sparse optimizer: capture this lookup's cotangent via a
            # perturb hook + record the resolved rows; the Trainer routes
            # them into the fused Adagrad kernel (ops/fused_adagrad.py)
            out = self.perturb(f"grad_{fc.name}", out)
            self.sow("embed_ids", f"grad_{fc.name}", rows,
                     reduce_fn=lambda a, b: b)
            spec = self._specs[dim][fc.embedding_name]
            self._sow_sort_info(f"grad_{fc.name}", rows.reshape(-1, 1),
                                [(spec.offset, spec.vocab)])
        if not fc.trainable:
            out = jax.lax.stop_gradient(out)
        return out

    def _sow_sort_info(self, name: str, rows: jax.Array, col_ranges) -> None:
        """Pre-sort the update stream for the fused optimizer when the static
        table layout allows it (ops/stream_sort.py); the Trainer consumes the
        sown (slid, order) instead of running a generic pair sort."""
        from ..ops.stream_sort import blocked_sort

        info = blocked_sort(rows, col_ranges)
        if info is not None:
            self.sow("embed_sort", name, info, reduce_fn=lambda a, b: b)

    def lookup(self, fc, ids: jax.Array) -> jax.Array:
        """Embed arbitrary-shape ids for one feature column -> ids.shape + [d]."""
        return self._take(fc, self._resolve_ids(fc, ids))

    def __call__(self, batch: Dict[str, jax.Array],
                 columns: Optional[Sequence[FeatureColumn]] = None) -> EmbedOutputs:
        if columns is None:
            sparse_cols, varlen_cols, dense_cols = (
                self._sparse_cols, self._varlen_cols, self._dense_cols)
        else:
            sparse_cols, varlen_cols, dense_cols = split_columns(columns)

        # --- fused single-valued sparse lookup: one gather per dim group ---
        sparse: Dict[str, jax.Array] = {}
        fused: Dict[int, Tuple[Tuple[str, ...], jax.Array]] = {}
        by_dim: Dict[int, list] = {}
        for fc in sparse_cols:
            by_dim.setdefault(fc.embedding_dim, []).append(fc)
        from ..ops import dispatch
        for dim, fcs in by_dim.items():
            rows = jnp.stack(
                [self._resolve_ids(fc, batch[fc.name].reshape(-1)) for fc in fcs],
                axis=1)  # [B, F]
            embeds = self._gather(dim, rows.reshape(-1))
            embeds = embeds.reshape(rows.shape + (dim,))  # [B, F, d]
            if dispatch.fused_opt_mode():
                embeds = self.perturb(f"grad_d{dim}_sparse", embeds)
                self.sow("embed_ids", f"grad_d{dim}_sparse", rows,
                         reduce_fn=lambda a, b: b)
                specs = [self._specs[dim][fc.embedding_name] for fc in fcs]
                self._sow_sort_info(
                    f"grad_d{dim}_sparse", rows,
                    [(s.offset, s.vocab) for s in specs])
            if all(fc.trainable for fc in fcs):
                fused[dim] = (tuple(fc.name for fc in fcs), embeds)
            for i, fc in enumerate(fcs):
                e = embeds[:, i, :]
                if not fc.trainable:
                    e = jax.lax.stop_gradient(e)
                sparse[fc.name] = e

        # --- varlen features: raw sequences, masks, pooled vectors ---
        varlen_raw: Dict[str, jax.Array] = {}
        varlen_mask: Dict[str, jax.Array] = {}
        pooled: Dict[str, jax.Array] = {}
        for fc in varlen_cols:
            ids = batch[fc.name]  # [B, T]
            seq = self.lookup(fc, ids)  # [B, T, d]
            if fc.length_name is not None:
                mask = length_mask(batch[fc.length_name], fc.maxlen)
            else:
                mask = id_mask(ids)
            varlen_raw[fc.name] = seq
            varlen_mask[fc.name] = mask
            if fc.weight_name is not None:
                seq_w = weighted_sequence(seq, batch[fc.weight_name], mask,
                                          normalize=fc.weight_norm)
            else:
                seq_w = seq
            pooled[fc.name] = sequence_pooling(seq_w, mask, mode=fc.combiner)

        # --- dense features (+ optional transform_fn) ---
        dense = None
        if dense_cols:
            parts = []
            for fc in dense_cols:
                v = batch[fc.name]
                if v.ndim == 1:
                    v = v[:, None]
                if fc.transform_fn is not None:
                    v = fc.transform_fn(v)
                parts.append(v.astype(jnp.float32))
            dense = jnp.concatenate(parts, axis=-1)

        return EmbedOutputs(sparse, varlen_raw, varlen_mask, pooled, dense,
                            fused)


class UnifiedEmbedding(nn.Module):
    """Embedding collection with the first-order (wide/linear) weight fused in.

    Each id's row stores ``[v_1..v_d, w]`` — factor vector plus its linear
    weight — in ONE lane-packed table, so models that need both (FM, DeepFM,
    Wide&Deep, AFM: ``model/deepFM.py:15-31`` etc.) pay a single gather
    forward and a single scatter-add backward instead of two of each
    (measured: the separate d=1 linear path cost an extra 2.5ms/step at
    batch 8192 on v5e).

    ``__call__`` returns ``(EmbedOutputs with d-dim embeddings, linear_logit)``.
    """

    feature_columns: Tuple[FeatureColumn, ...]
    use_bias: bool = True

    @nn.compact
    def __call__(self, batch: Dict[str, jax.Array]):
        sparse_cols, varlen_cols, dense_cols = split_columns(self.feature_columns)
        aug = []
        for fc in sparse_cols:
            aug.append(dataclasses.replace(fc, embedding_dim=fc.embedding_dim + 1))
        for fc in varlen_cols:
            aug.append(dataclasses.replace(fc, sparsefeat=dataclasses.replace(
                fc.sparsefeat, embedding_dim=fc.embedding_dim + 1)))
        aug += list(dense_cols)
        out = EmbeddingCollection(tuple(aug), name="embeddings")(batch)

        B = next(iter(batch.values())).shape[0]
        linear = jnp.zeros((B, 1), jnp.float32)
        fused: Dict[int, Tuple[Tuple[str, ...], jax.Array]] = {}
        fused_names = set()
        for dim, (names, arr) in out.fused.items():
            # one reduction over the fused [B, F, d+1] group instead of F
            # chained per-feature adds
            linear = linear + arr[..., -1].sum(axis=1, keepdims=True)
            fused[dim - 1] = (names, arr[..., :-1])
            fused_names.update(names)
        for n, v in out.sparse.items():
            if n not in fused_names:
                linear = linear + v[..., -1:]
        for v in out.pooled.values():
            linear = linear + v[..., -1:]
        sparse = {n: v[..., :-1] for n, v in out.sparse.items()}
        varlen_raw = {n: v[..., :-1] for n, v in out.varlen_raw.items()}
        pooled = {n: v[..., :-1] for n, v in out.pooled.items()}
        if out.dense is not None:
            w = self.param("dense_w", nn.initializers.normal(1e-4),
                           (out.dense.shape[-1], 1))
            linear = linear + jnp.dot(out.dense, w,
                                      preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (1,))
            linear = linear + b
        return (EmbedOutputs(sparse, varlen_raw, out.varlen_mask, pooled,
                             out.dense, fused), linear)


class LinearEmbedding(nn.Module):
    """First-order (wide) logit: per-id scalar weights + dense weights.

    The linear part of FM/Wide&Deep — equivalent to a dim-1 ``EmbeddingCollection``
    over the one-hot encoding (``WideLayer``, ``layer/interaction.py:11-26`` /
    ``FMLayer`` w1, ``layer/interaction.py:97-103``) without materializing one-hots.
    """

    feature_columns: Tuple[FeatureColumn, ...]
    use_bias: bool = True

    @nn.compact
    def __call__(self, batch: Dict[str, jax.Array]) -> jax.Array:
        sparse_cols, varlen_cols, dense_cols = split_columns(self.feature_columns)
        linear_cols = []
        for fc in sparse_cols:
            linear_cols.append(dataclasses.replace(
                fc, embedding_dim=1, embedding_name=f"linear_{fc.embedding_name}",
                init_std=1e-4))
        for fc in varlen_cols:
            linear_cols.append(dataclasses.replace(
                fc, sparsefeat=dataclasses.replace(
                    fc.sparsefeat, embedding_dim=1,
                    embedding_name=f"linear_{fc.embedding_name}", init_std=1e-4)))
        linear_cols += dense_cols
        out = EmbeddingCollection(tuple(linear_cols), name="linear_tables")(batch)
        logit = jnp.zeros((next(iter(batch.values())).shape[0], 1), jnp.float32)
        for v in out.sparse.values():
            logit = logit + v
        for v in out.pooled.values():
            logit = logit + v
        if out.dense is not None:
            w = self.param("dense_w", nn.initializers.normal(1e-4),
                           (out.dense.shape[-1], 1))
            logit = logit + jnp.dot(out.dense, w, preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (1,))
            logit = logit + b
        return logit  # [B, 1]
