"""Blocked single-array id sort for the fused embedding optimizer.

The fused Adagrad kernel (``ops/fused_adagrad.py``) consumes a *sorted* update
stream. The generic path sorts ``(id, index)`` pairs over the whole stream —
measured 0.89 ms for N=426k on v5e, and the sort network moves two arrays.
This module exploits structure the lookup site knows statically:

- the id matrix is ``[B, F]`` with column ``f`` drawn from ONE table whose
  ``[offset, offset+vocab)`` range is a compile-time constant;
- tables are laid out contiguously in offset order inside the stack, so blocks
  of per-column sorted ids, concatenated in offset order, are **globally
  sorted** (ranges are disjoint);
- both the within-block index and the offset-relative id are small, so key and
  payload **pack into one int32** and a single-array batched sort suffices
  (measured: key-only sort 0.394 ms vs key+payload 0.889 ms at N=426k; the
  [F, B] batched layout parallelizes further across sort rows).

Produces ``(slid, order)`` — sorted logical ids + the permutation into the
original row-major ``[B, F]`` flattening — exactly what ``fused_adagrad_apply``
needs, computed in the forward pass (ids are forward values; no autodiff).

No reference counterpart: the reference updates each Keras ``Embedding``
densely (``utils/inputs.py:22-56``).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _bits(n: int) -> int:
    return max(int(n - 1).bit_length(), 1)


def blocked_sort(rows: jax.Array,
                 col_ranges: Sequence[Tuple[int, int]],
                 ) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Sort a ``[B, F]`` resolved-id matrix into one globally sorted stream.

    ``col_ranges[f] = (offset, vocab)`` — the static table range of column f
    (ids are assumed already clipped/hashed into range by the lookup).

    Returns ``(slid [B*F], order [B*F])`` such that ``slid`` is nondecreasing
    and ``slid == rows.reshape(-1)[order]``; or ``None`` when the static
    structure doesn't support the packed single-key sort (partially
    overlapping table ranges, ragged shared-table groups, or key bits
    exceeding int31) — callers fall back to the generic pair sort.
    """
    if rows.ndim == 1:
        rows = rows[:, None]
    if rows.ndim != 2:
        return None
    B, F = rows.shape
    if len(col_ranges) != F or B * F == 0:
        return None

    # group columns by identical range (shared tables); distinct ranges must
    # be disjoint for block concatenation to be globally sorted
    groups: dict = {}
    for f, rng in enumerate(col_ranges):
        groups.setdefault((int(rng[0]), int(rng[1])), []).append(f)
    ranges = sorted(groups)
    for (o1, v1), (o2, _v2) in zip(ranges, ranges[1:]):
        if o1 + v1 > o2:
            return None  # partially overlapping ranges: cannot block-sort
    sizes = {len(cols) for cols in groups.values()}
    if len(sizes) != 1:
        return None  # ragged groups: would need padded blocks; rare — fallback
    c = sizes.pop()
    G = len(ranges)

    span = max(v for _o, v in ranges)
    idx_bits = _bits(B * c)
    if _bits(span) + idx_bits > 31:
        return None
    mask = jnp.int32((1 << idx_bits) - 1)

    # blocks [G, c*B]: group g holds columns groups[ranges[g]] (offset order);
    # block-local index j = b*c + ci  ->  original flat index b*F + cols[g, ci]
    offsets = jnp.asarray([o for o, _v in ranges], jnp.int32)    # [G]
    cols = jnp.asarray([groups[r] for r in ranges], jnp.int32)   # [G, c]
    rel = (rows.astype(jnp.int32)[:, cols.reshape(-1)]
           .reshape(B, G, c) - offsets[None, :, None])           # [B, G, c]
    local = (jnp.arange(B, dtype=jnp.int32)[:, None, None] * c
             + jnp.arange(c, dtype=jnp.int32)[None, None, :])
    keys = (rel << idx_bits) | local                             # [B, G, c]
    # unstable: keys are unique (index bits), stability buys nothing
    skeys = jnp.sort(jnp.transpose(keys, (1, 0, 2)).reshape(G, -1), axis=1,
                     stable=False)
    slid = (skeys >> idx_bits) + offsets[:, None]                # [G, c*B]
    j = skeys & mask
    order = (j // c) * F + cols[jnp.arange(G, dtype=jnp.int32)[:, None], j % c]
    return slid.reshape(-1), order.reshape(-1)
