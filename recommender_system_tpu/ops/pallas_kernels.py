"""Hand-written Pallas TPU kernels for the hot interaction ops.

Three fused kernels (the BASELINE configs' hot paths — SURVEY.md §2.1 notes):

- ``fm_fused``        — FM linear + pairwise term in one VMEM pass
                        (kernelizes ``FMLayer.call``, ``layer/interaction.py:106-113``)
- ``cross_fused``     — the full L-layer DCN cross stack in one kernel: x0 and
                        x stay resident in VMEM across layers instead of L
                        HBM round-trips (``CrossLayer.call``, ``layer/interaction.py:77-83``)
- ``din_attention_fused`` — DIN target attention: 4-way feature concat is
                        *algebraically folded into the first matmul* (split
                        W1 into its q/k/minus/product blocks), then the 2-layer
                        scorer MLP, mask, softmax and weighted sum all run in
                        VMEM — the ``[B, T, 4K]`` concat tensor from
                        ``layer/interaction.py:386-406`` never exists in HBM.

Each op is a ``jax.custom_vjp``: forward = Pallas kernel, backward = the VJP of
the pure-jax reference (mathematically identical; residuals are the primal
inputs). Gradcheck tests in ``tests/test_pallas.py`` compare both against
numerical/autodiff ground truth; on CPU the kernels run in interpret mode.

**Measured on TPU v5e (2026-08-17, batch 8192, fp32, fetch-forced
differential timing — ``utils/benchmark.py``):** XLA's automatic fusion beats
these hand kernels on the small memory-bound interaction ops — FM [8192,256]
k=16: ~125-157us (XLA) vs ~170-365us (Pallas); cross-stack L=6 D=256: ~404 vs
~587us; DIN attention T=50 K=32: ~461 vs ~2313us. Dispatch therefore defaults
to the XLA path (``dispatch.use_pallas``); these kernels stay as correct,
tested, opt-in alternates. The embedding hot path is instead handled by the
lane-packed storage layout (``layers/embedding.py``), which made XLA's own
scatter 5.9x faster than the naive narrow layout.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

NEG_INF = -(2.0 ** 32) + 1


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _batch_grid(B: int, tile: int) -> Tuple[int, int]:
    tile = min(tile, _round_up(B, 8))
    return pl.cdiv(B, tile), tile


# ---------------------------------------------------------------------------
# FM: linear + pairwise term
# ---------------------------------------------------------------------------

def _fm_kernel(x_ref, w1_ref, v_ref, o_ref):
    x = x_ref[:]
    v = v_ref[:]
    xv = jnp.dot(x, v, preferred_element_type=jnp.float32)           # [bT, k]
    x2v2 = jnp.dot(x * x, v * v, preferred_element_type=jnp.float32)  # [bT, k]
    linear = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    pair = 0.5 * jnp.sum(xv * xv - x2v2, axis=-1, keepdims=True)
    o_ref[:] = linear + pair


def _fm_pallas(x, w1, v, batch_tile: int = 512):
    B, D = x.shape
    grid, tile = _batch_grid(B, batch_tile)
    return pl.pallas_call(
        _fm_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, v.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        interpret=interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * D * v.shape[1] + 2 * B * D,
            bytes_accessed=4 * (B * D + D * v.shape[1] + B),
            transcendentals=0),
    )(x, w1, v)


def _fm_ref(x, w1, v):
    from .interactions import fm_interaction

    linear = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    return linear + fm_interaction(x, v)


@jax.custom_vjp
def fm_fused(x, w1, v):
    """FM logit w/o global bias: ``x.w1 + 0.5 sum((xv)^2 - x^2 v^2)`` -> [B,1]."""
    return _fm_pallas(x, w1, v)


def _fm_fwd(x, w1, v):
    return _fm_pallas(x, w1, v), (x, w1, v)


def _fm_bwd(res, g):
    x, w1, v = res
    _, vjp = jax.vjp(_fm_ref, x, w1, v)
    return vjp(g)


fm_fused.defvjp(_fm_fwd, _fm_bwd)


# ---------------------------------------------------------------------------
# DCN cross stack
# ---------------------------------------------------------------------------

def _cross_kernel(x0_ref, w_ref, b_ref, o_ref):
    x0 = x0_ref[:]                       # [bT, D]
    L = w_ref.shape[0]

    def layer(l, x):
        w_l = w_ref[l, :]                # [D]
        b_l = b_ref[l, :]
        s = jnp.dot(x, w_l[:, None],
                    preferred_element_type=jnp.float32)  # [bT, 1]
        return x0 * s + b_l[None, :] + x

    o_ref[:] = jax.lax.fori_loop(0, L, layer, x0)


def _cross_pallas(x0, weights, biases, batch_tile: int = 512):
    B, D = x0.shape
    L = weights.shape[0]
    grid, tile = _batch_grid(B, batch_tile)
    return pl.pallas_call(
        _cross_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        interpret=interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * L + 3 * B * D * L,
            bytes_accessed=4 * (2 * B * D + 2 * L * D),
            transcendentals=0),
    )(x0, weights, biases)


def _cross_ref(x0, weights, biases):
    from .interactions import cross_network

    return cross_network(x0, weights, biases)


@jax.custom_vjp
def cross_fused(x0, weights, biases):
    """DCN cross stack ``x_{l+1} = x0 (x_l.w_l) + b_l + x_l`` -> [B, D]."""
    return _cross_pallas(x0, weights, biases)


def _cross_fwd(x0, w, b):
    return _cross_pallas(x0, w, b), (x0, w, b)


def _cross_bwd(res, g):
    x0, w, b = res
    _, vjp = jax.vjp(_cross_ref, x0, w, b)
    return vjp(g)


cross_fused.defvjp(_cross_fwd, _cross_bwd)


# ---------------------------------------------------------------------------
# DIN target attention (2-hidden-layer scorer MLP)
# ---------------------------------------------------------------------------

def _din_kernel(q_ref, k_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w3_ref, b3_ref, o_ref, *, activation: str,
                weight_normalization: bool, return_scores: bool):
    q = q_ref[:]            # [bT, K]
    keys = k_ref[:]         # [bT, T, K]
    mask = mask_ref[:]      # [bT, T]
    bT, T, K = keys.shape

    # W1 [4K, H1] splits into blocks for [q, k, q-k, q*k]:
    #   h = q(W1q + W1d) + k(W1k - W1d) + (q*k) W1p  — concat never materialized.
    w1 = w1_ref[:]
    w1_q = w1[:K]
    w1_k = w1[K: 2 * K]
    w1_d = w1[2 * K: 3 * K]
    w1_p = w1[3 * K:]

    a = jnp.dot(q, w1_q + w1_d, preferred_element_type=jnp.float32)  # [bT, H1]
    keys2 = keys.reshape(bT * T, K)
    qk2 = (q[:, None, :] * keys).reshape(bT * T, K)
    h = (jnp.dot(keys2, w1_k - w1_d, preferred_element_type=jnp.float32)
         + jnp.dot(qk2, w1_p, preferred_element_type=jnp.float32))
    h = h.reshape(bT, T, -1) + a[:, None, :] + b1_ref[:][None, :, :]

    if activation == "sigmoid":
        act = jax.nn.sigmoid
    elif activation == "relu":
        act = jax.nn.relu
    else:
        raise ValueError(activation)

    h = act(h)
    h2 = act(jnp.dot(h.reshape(bT * T, -1), w2_ref[:],
                     preferred_element_type=jnp.float32)
             + b2_ref[:])
    score = (jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
             + b3_ref[:]).reshape(bT, T)

    valid = mask > 0.5
    if weight_normalization:
        score = jnp.where(valid, score, NEG_INF)
        score = jax.nn.softmax(score, axis=-1)
    else:
        score = jnp.where(valid, score, 0.0)

    if return_scores:
        o_ref[:] = score
    else:
        # batched-dot einsum doesn't lower in Mosaic; multiply-reduce on the VPU
        o_ref[:] = jnp.sum(score[:, :, None] * keys, axis=1)


def _din_pallas(query, keys, mask, w1, b1, w2, b2, w3, b3, activation,
                weight_normalization, return_scores, batch_tile: int = 256):
    B, T, K = keys.shape
    H1, H2 = w1.shape[1], w2.shape[1]
    # Size the batch tile to a ~4MB working-set budget (VMEM is 16MB and the
    # pipeline double-buffers input blocks): per-row floats ~= keys + q*keys
    # copies + MLP activations + scores.
    per_row_bytes = 4 * (2 * K + 2 * T * K + T * (H1 + H2 + 2))
    budget_rows = max(8, (4 * 1024 * 1024) // max(per_row_bytes, 1))
    batch_tile = min(batch_tile, _round_up(budget_rows, 8) - 7)
    batch_tile = max(8, (batch_tile // 8) * 8)
    grid, tile = _batch_grid(B, batch_tile)
    out_cols = T if return_scores else K
    kernel = functools.partial(
        _din_kernel, activation=activation,
        weight_normalization=weight_normalization, return_scores=return_scores)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, T, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * K, H1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H1, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_cols), jnp.float32),
        interpret=interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (4 * K * H1 + H1 * H2 + H2) + 2 * B * T * K,
            bytes_accessed=4 * (B * T * K + B * K + 4 * K * H1 + H1 * H2),
            transcendentals=2 * B * T * (H1 + H2)),
    )(query, keys, mask.astype(jnp.float32), w1, b1.reshape(1, -1), w2,
      b2.reshape(1, -1), w3, b3.reshape(1, 1))


def din_attention_ref(query, keys, mask, w1, b1, w2, b2, w3, b3,
                      activation: str = "sigmoid",
                      weight_normalization: bool = True,
                      return_scores: bool = False,
                      dtype=None):
    """Pure-jax reference: tile-query 4-way concat MLP scorer + masked softmax
    + pooling (``Attention.call``, ``layer/interaction.py:369-406``).

    ``dtype`` (e.g. ``jnp.bfloat16``) sets the scorer's matmul/activation
    compute dtype — params stay f32, accumulation is f32, and the masked
    softmax + pooling run in f32. Halves the [B, T, h1]/[B, T, h2]
    intermediate HBM traffic on TPU.
    """
    if activation == "sigmoid":
        act = jax.nn.sigmoid
    elif activation == "relu":
        act = jax.nn.relu
    else:
        raise ValueError(activation)
    cdt = dtype or jnp.float32
    # Concat-folded first layer: with w1 = [wq; wk; wm; wp] (4K x h1),
    #   concat([q, k, q-k, q*k]) @ w1
    #     == q @ (wq + wm)  +  [k || q*k] @ [wk - wm ; wp]
    # exactly — so the [B, T, 4K] concat (210 MB at B=8192, T=50, K=32,
    # plus its cotangent) is never materialized. The query term is [B, h1]
    # broadcast over T; the keys and q*k parts run as ONE dot with a
    # 64-wide contraction (26-41% faster than two 32-wide dots on v5e:
    # benchmarks/din_kernel_lab.py, 2026-08-21).
    K = keys.shape[-1]
    w1 = w1.astype(cdt)
    q_c, keys_c = query.astype(cdt), keys.astype(cdt)
    wq, wk, wm, wp = w1[:K], w1[K:2 * K], w1[2 * K:3 * K], w1[3 * K:]
    ck = jnp.concatenate([keys_c, q_c[:, None, :] * keys_c], axis=-1)
    wkp = jnp.concatenate([wk - wm, wp], axis=0)
    h_pre = (jnp.dot(q_c, wq + wm, preferred_element_type=jnp.float32)[:, None, :]
             + jnp.dot(ck, wkp, preferred_element_type=jnp.float32))
    h = act(h_pre + b1).astype(cdt)
    h = act(jnp.dot(h, w2.astype(cdt),
                    preferred_element_type=jnp.float32) + b2).astype(cdt)
    score = (jnp.dot(h, w3.astype(cdt),
                     preferred_element_type=jnp.float32) + b3)[..., 0]
    valid = mask
    if weight_normalization:
        score = jax.nn.softmax(jnp.where(valid, score, NEG_INF), axis=-1)
    else:
        score = jnp.where(valid, score, 0.0)
    if return_scores:
        return score
    return jnp.einsum("bt,btk->bk", score, keys,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def din_attention_fused(query, keys, mask, w1, b1, w2, b2, w3, b3,
                        activation: str = "sigmoid",
                        weight_normalization: bool = True,
                        return_scores: bool = False):
    """Fused DIN attention -> pooled [B,K] (or scores [B,T]).

    DEMOTED (2026-08-21, ``benchmarks/interaction_dispatch.py``): 4.49 ms
    fwd vs XLA's 1.10 ms at the DIN bench shape — the materialized
    [bT, T, 4K]-equivalent scorer blocks lose to XLA's fusion. Kept as a
    correctness cross-check (``tests/test_pallas.py``) and layout example
    only; production dispatch always takes the XLA path (``ops/dispatch``).
    """
    return _din_pallas(query, keys, mask, w1, b1, w2, b2, w3, b3,
                       activation, weight_normalization, return_scores)


def _din_fwd(query, keys, mask, w1, b1, w2, b2, w3, b3, activation,
             weight_normalization, return_scores):
    out = _din_pallas(query, keys, mask, w1, b1, w2, b2, w3, b3,
                      activation, weight_normalization, return_scores)
    return out, (query, keys, mask, w1, b1, w2, b2, w3, b3)


def _din_bwd(activation, weight_normalization, return_scores, res, g):
    query, keys, mask, w1, b1, w2, b2, w3, b3 = res

    def ref(query, keys, w1, b1, w2, b2, w3, b3):
        return din_attention_ref(query, keys, mask, w1, b1, w2, b2, w3, b3,
                                 activation, weight_normalization,
                                 return_scores)

    _, vjp = jax.vjp(ref, query, keys, w1, b1, w2, b2, w3, b3)
    dq, dk, dw1, db1, dw2, db2, dw3, db3 = vjp(g)
    # mask is boolean semantics carried as float32 -> zero cotangent
    return dq, dk, jnp.zeros_like(mask), dw1, db1, dw2, db2, dw3, db3


din_attention_fused.defvjp(_din_fwd, _din_bwd)
