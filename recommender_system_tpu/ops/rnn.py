"""Recurrent cells for interest evolution: GRU and attention-gated AUGRU.

TPU-native replacement for the reference's hand-unrolled Python RNN loop
(``layer/activation.py:145-264``) and ``AUGRUCell`` (``layer/activation.py:91-142``):
a single ``jax.lax.scan`` over time with masked state carry — XLA compiles the scan
once regardless of sequence length, and all per-step matmuls hit the MXU.

Gate layout follows the reference kernel slicing (``activation.py:113-126``):
``kernel[:, :H]`` = update z, ``[:, H:2H]`` = reset r, ``[:, 2H:]`` = candidate h.

AUGRU semantics note: the reference computes ``z = att * z`` then
``h = z*h_prev + (1-z)*hh`` (``activation.py:132-141``), which *wipes* state when
attention is 0. The DIEN paper's intent (and what we implement) is the inverse:
attention scales the *update amount*, so ``att = 0`` keeps the previous state:
``u = att * (1 - z);  h = (1 - u) * h_prev + u * hh``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class GRUParams(NamedTuple):
    wx: jax.Array  # [D, 3H]
    wh: jax.Array  # [H, 3H]
    bias: Optional[jax.Array] = None  # [3H] (reference AUGRUCell has none, :114)


def init_gru_params(rng, input_dim: int, hidden: int, use_bias: bool = True,
                    dtype=jnp.float32) -> GRUParams:
    k1, k2 = jax.random.split(rng)
    scale_x = 1.0 / jnp.sqrt(input_dim)
    wx = jax.random.uniform(k1, (input_dim, 3 * hidden), dtype, -scale_x, scale_x)
    wh = _orthogonal_3h(k2, hidden, dtype)
    bias = jnp.zeros((3 * hidden,), dtype) if use_bias else None
    return GRUParams(wx, wh, bias)


def _orthogonal_3h(rng, hidden: int, dtype):
    init = jax.nn.initializers.orthogonal()
    cols = [init(k, (hidden, hidden), dtype) for k in jax.random.split(rng, 3)]
    return jnp.concatenate(cols, axis=1)


def _gates(params: GRUParams, x_t: jax.Array, h: jax.Array, dtype=None):
    H = params.wh.shape[0]
    cdt = dtype or jnp.float32
    wx, wh = params.wx.astype(cdt), params.wh.astype(cdt)
    x_t = x_t.astype(cdt)
    hc = h.astype(cdt)
    proj_x = jnp.dot(x_t, wx, preferred_element_type=jnp.float32)
    if params.bias is not None:
        proj_x = proj_x + params.bias
    proj_h = jnp.dot(hc, wh[:, : 2 * H], preferred_element_type=jnp.float32)
    z = jax.nn.sigmoid(proj_x[:, :H] + proj_h[:, :H])
    r = jax.nn.sigmoid(proj_x[:, H: 2 * H] + proj_h[:, H: 2 * H])
    hh = jnp.tanh(
        proj_x[:, 2 * H:]
        + jnp.dot((r * h).astype(cdt), wh[:, 2 * H:],
                  preferred_element_type=jnp.float32))
    return z, hh


def gru(
    params: GRUParams,
    inputs: jax.Array,
    mask: Optional[jax.Array] = None,
    h0: Optional[jax.Array] = None,
    dtype=None,
    remat: bool = True,
    unroll: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """GRU over ``inputs [B, T, D]`` with optional ``mask [B, T]``.

    Masked steps carry state and output unchanged (parity with the reference's
    ``where_v2`` state carry, ``activation.py:218-233``).

    ``dtype`` sets the gate-matmul compute dtype (params/carry/outputs stay
    f32, accumulation f32). ``remat=True`` wraps the step in ``jax.checkpoint``
    so backward recomputes the gates from (x_t, h_{t-1}) instead of streaming
    ~4 [B, H] residuals per step through HBM — the scan's carry chain (== the
    outputs) is the only residual left. Default True: measured 2x on fwd+bwd
    at the DIEN shape (B=8192, T=50, H=32: 3.09 -> 1.59 ms GRU, 3.47 -> 1.77
    AUGRU, v5e 2026-08-20, benchmarks/rnn_variants.py); forward-only jit is
    unaffected by ``jax.checkpoint``.

    Returns (outputs ``[B, T, H]``, final state ``[B, H]``).
    """
    B, T, _ = inputs.shape
    H = params.wh.shape[0]
    # carries/outputs are f32 regardless of input dtype (the gate matmuls
    # accumulate in f32; a bf16 carry would change dtype across scan steps)
    h0 = jnp.zeros((B, H), jnp.float32) if h0 is None else h0.astype(jnp.float32)

    def step(h, xs):
        x_t, m_t = xs
        z, hh = _gates(params, x_t, h, dtype)
        h_new = z * h + (1.0 - z) * hh  # keras GRU convention (z = keep gate)
        h_new = jnp.where(m_t[:, None], h_new, h)
        return h_new, h_new

    if remat:
        step = jax.checkpoint(step)
    m = jnp.ones((B, T), bool) if mask is None else mask
    xs = (jnp.swapaxes(inputs, 0, 1), jnp.swapaxes(m, 0, 1))
    h_last, outs = jax.lax.scan(step, h0, xs, unroll=unroll)
    return jnp.swapaxes(outs, 0, 1), h_last


def augru(
    params: GRUParams,
    inputs: jax.Array,
    att_scores: jax.Array,
    mask: Optional[jax.Array] = None,
    h0: Optional[jax.Array] = None,
    dtype=None,
    remat: bool = True,
    unroll: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Attention-gated GRU (DIEN interest evolution).

    ``att_scores [B, T]`` scales the per-step update amount (see module docstring
    for the divergence from the reference's ``z *= att``).

    ``dtype``/``remat`` as in :func:`gru`.

    Returns (outputs ``[B, T, H]``, final state ``[B, H]``).
    """
    B, T, _ = inputs.shape
    H = params.wh.shape[0]
    h0 = jnp.zeros((B, H), jnp.float32) if h0 is None else h0.astype(jnp.float32)

    def step(h, xs):
        x_t, a_t, m_t = xs
        z, hh = _gates(params, x_t, h, dtype)
        u = a_t[:, None] * (1.0 - z)  # attention-scaled update amount
        h_new = (1.0 - u) * h + u * hh
        h_new = jnp.where(m_t[:, None], h_new, h)
        return h_new, h_new

    if remat:
        step = jax.checkpoint(step)
    m = jnp.ones((B, T), bool) if mask is None else mask
    xs = (jnp.swapaxes(inputs, 0, 1),
          jnp.swapaxes(att_scores, 0, 1),
          jnp.swapaxes(m, 0, 1))
    h_last, outs = jax.lax.scan(step, h0, xs, unroll=unroll)
    return jnp.swapaxes(outs, 0, 1), h_last


class LSTMParams(NamedTuple):
    wx: jax.Array  # [D, 4H] gate order i, f, c, o (keras layout, layer/nlp.py:347-358)
    wh: jax.Array  # [H, 4H]
    bias: jax.Array  # [4H]


def init_lstm_params(rng, input_dim: int, hidden: int, dtype=jnp.float32,
                     forget_bias: float = 1.0) -> LSTMParams:
    k1, k2 = jax.random.split(rng)
    scale = 1.0 / jnp.sqrt(input_dim)
    wx = jax.random.uniform(k1, (input_dim, 4 * hidden), dtype, -scale, scale)
    init = jax.nn.initializers.orthogonal()
    wh = jnp.concatenate(
        [init(k, (hidden, hidden), dtype) for k in jax.random.split(k2, 4)], axis=1)
    bias = jnp.zeros((4 * hidden,), dtype).at[hidden: 2 * hidden].set(forget_bias)
    return LSTMParams(wx, wh, bias)


def lstm(
    params: LSTMParams,
    inputs: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Standard LSTM over ``[B, T, D]``.

    Implements the *intended* behavior of the reference's vendored (and broken)
    ``LSTMCell`` (``layer/nlp.py:269-449`` — its forget gate drops the recurrent
    term via a comma typo at ``:375-376``; we compute ``f = sigma(x_f + h.Wf)``).

    Returns (outputs ``[B, T, H]``, (h ``[B, H]``, c ``[B, H]``)).
    """
    B, T, _ = inputs.shape
    H = params.wh.shape[0]
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)

    def step(carry, xs):
        h, c = carry
        x_t, m_t = xs
        gates = (jnp.dot(x_t, params.wx, preferred_element_type=jnp.float32)
                 + jnp.dot(h, params.wh, preferred_element_type=jnp.float32)
                 + params.bias)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H: 2 * H])
        g = jnp.tanh(gates[:, 2 * H: 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        keep = m_t[:, None]
        h_new = jnp.where(keep, h_new, h)
        c_new = jnp.where(keep, c_new, c)
        return (h_new, c_new), h_new

    m = jnp.ones((B, T), bool) if mask is None else mask
    xs = (jnp.swapaxes(inputs, 0, 1), jnp.swapaxes(m, 0, 1))
    (h_last, c_last), outs = jax.lax.scan(step, (h0, c0), xs)
    return jnp.swapaxes(outs, 0, 1), (h_last, c_last)
