"""Hand-written VJP for the XLA DIN attention path: rematerialized scorer.

Autodiff of ``din_attention_ref`` streams the scorer activations to HBM as
residuals — at the DIN bench shape (B=16384, T=50, K=32, h1=80, h2=40) that
is ~0.8 GB written in the forward and re-read in the backward ([B,T,h1]
pre-act f32 + post-act + [B,T,h2] + the q*k product).  This VJP saves only
the op inputs plus the [B,T] attention scores (3 MB) and *recomputes* the
scorer inside the backward, and it decomposes the first-layer cotangents
per concat part exactly the way the forward folds the ``[q, k, q-k, q*k]``
concat (see ``din_attention_ref``):

    with w1 = [wq; wk; wm; wp],  A = wq+wm,  Bw = wk-wm,  P = wp:
      dh_pre @ A.T  -> dq          q.T    @ dh_pre -> dA  (= dwq)
      dh_pre @ Bw.T -> dkeys       keys.T @ dh_pre -> dBw (= dwk)
      dh_pre @ P.T  -> d(q*k)      (qk).T @ dh_pre -> dP  (= dwp)
      dwm = dA - dBw

so the ``[B, T, 4K]`` concat (and its cotangent) never materializes in
EITHER direction.  Measured on v5e (benchmarks/interaction_dispatch.py,
2026-08-21): see BASELINE.md round 5.

Reference semantics: ``Attention.call`` (``layer/interaction.py:355-406``),
``LocalActivationUnit`` (``layer/core.py:28-120``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .seqpool import NEG_INF

_F32 = jnp.float32


def _dtype_of(name):
    return {None: jnp.float32, "bfloat16": jnp.bfloat16,
            "float32": jnp.float32}[name]


def _act_fns(activation):
    if activation == "sigmoid":
        return jax.nn.sigmoid, lambda a: a * (1.0 - a)
    if activation == "relu":
        return jax.nn.relu, lambda a: (a > 0).astype(jnp.float32)
    raise ValueError(activation)


def _scorer(query, keys, w1, b1, w2, b2, w3, b3, activation, cdt):
    """Concat-folded 2-hidden-layer scorer -> (logits [B,T], h1, h2, ck).

    Identical math/cast structure to ``din_attention_ref`` so the remat
    recompute is numerically the forward.  The keys and q*k first-layer
    parts run as ONE dot with a 64-wide contraction over
    ``ck = [keys || q*keys]`` — measured 26-41% faster than two 32-wide
    dots on v5e (benchmarks/din_kernel_lab.py, 2026-08-21: 811 vs 1100 us
    f32 fwd at B=16384): the MXU contraction utilization doubles and XLA
    fuses the lane-concat into the dot's operand read.
    """
    act, _ = _act_fns(activation)
    K = keys.shape[-1]
    w1c = w1.astype(cdt)
    q_c, keys_c = query.astype(cdt), keys.astype(cdt)
    wq, wk, wm, wp = w1c[:K], w1c[K:2 * K], w1c[2 * K:3 * K], w1c[3 * K:]
    ck = jnp.concatenate([keys_c, q_c[:, None, :] * keys_c], axis=-1)
    wkp = jnp.concatenate([wk - wm, wp], axis=0)
    h_pre = (jnp.dot(q_c, wq + wm, preferred_element_type=_F32)[:, None, :]
             + jnp.dot(ck, wkp, preferred_element_type=_F32))
    h1 = act(h_pre + b1)
    h1c = h1.astype(cdt)
    h2 = act(jnp.dot(h1c, w2.astype(cdt),
                     preferred_element_type=_F32) + b2)
    logits = (jnp.dot(h2.astype(cdt), w3.astype(cdt),
                      preferred_element_type=_F32) + b3)[..., 0]
    return logits, h1, h2, ck


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def din_attention_remat(query, keys, mask, w1, b1, w2, b2, w3, b3,
                        activation: str = "sigmoid",
                        weight_normalization: bool = True,
                        return_scores: bool = False,
                        dtype_name=None):
    """DIN attention with a remat + per-part-decomposed backward.

    Same contract as ``din_attention_ref`` with ``dtype`` passed as a static
    string (``None``/``'bfloat16'``/``'float32'``) so it can be a
    ``nondiff_argnum``.  ``mask`` must be bool.
    """
    cdt = _dtype_of(dtype_name)
    logits, _, _, _ = _scorer(query, keys, w1, b1, w2, b2, w3, b3,
                              activation, cdt)
    if weight_normalization:
        score = jax.nn.softmax(jnp.where(mask, logits, NEG_INF), axis=-1)
    else:
        score = jnp.where(mask, logits, 0.0)
    if return_scores:
        return score
    return jnp.einsum("bt,btk->bk", score, keys,
                      preferred_element_type=_F32)


def _din_remat_fwd(query, keys, mask, w1, b1, w2, b2, w3, b3,
                   activation, weight_normalization, return_scores,
                   dtype_name):
    cdt = _dtype_of(dtype_name)
    logits, _, _, _ = _scorer(query, keys, w1, b1, w2, b2, w3, b3,
                              activation, cdt)
    if weight_normalization:
        score = jax.nn.softmax(jnp.where(mask, logits, NEG_INF), axis=-1)
    else:
        score = jnp.where(mask, logits, 0.0)
    out = score if return_scores else jnp.einsum(
        "bt,btk->bk", score, keys, preferred_element_type=_F32)
    return out, (query, keys, mask, w1, b1, w2, b2, w3, b3, score)


def _din_remat_bwd(activation, weight_normalization, return_scores,
                   dtype_name, res, g):
    query, keys, mask, w1, b1, w2, b2, w3, b3, score = res
    cdt = _dtype_of(dtype_name)
    _, dact = _act_fns(activation)
    K = keys.shape[-1]

    # Recompute the scorer (cheap matmuls; no residual streaming).
    _, h1, h2, ck = _scorer(query, keys, w1, b1, w2, b2, w3, b3,
                            activation, cdt)
    w1c = w1.astype(cdt)
    wq, wk, wm, wp = w1c[:K], w1c[K:2 * K], w1c[2 * K:3 * K], w1c[3 * K:]
    wkp = jnp.concatenate([wk - wm, wp], axis=0)
    q_c, keys_c = query.astype(cdt), keys.astype(cdt)

    g = g.astype(_F32)
    if return_scores:
        dscore = g
        dkeys = jnp.zeros_like(keys)
    else:
        dscore = jnp.einsum("bk,btk->bt", g, keys,
                            preferred_element_type=_F32)
        dkeys = score[:, :, None] * g[:, None, :]  # pooling cotangent

    if weight_normalization:
        dlogits = score * (dscore
                           - jnp.sum(score * dscore, axis=-1, keepdims=True))
        dlogits = jnp.where(mask, dlogits, 0.0)
    else:
        dlogits = jnp.where(mask, dscore, 0.0)

    # layer 3: logits = h2 @ w3 + b3
    db3 = jnp.sum(dlogits)[None]
    dw3 = jnp.einsum("bth,bt->h", h2.astype(cdt), dlogits.astype(cdt),
                     preferred_element_type=_F32)[:, None]
    dh2 = dlogits[:, :, None] * w3[None, None, :, 0]
    du = dh2 * dact(h2)                                    # [B,T,h2] f32
    duc = du.astype(cdt)

    # layer 2: u = h1 @ w2 + b2
    db2 = jnp.sum(du, axis=(0, 1))
    h1c = h1.astype(cdt)
    H1, H2 = w2.shape
    dw2 = jnp.dot(h1c.reshape(-1, H1).T, duc.reshape(-1, H2),
                  preferred_element_type=_F32)
    dh1 = jnp.dot(duc, w2.astype(cdt).T, preferred_element_type=_F32)
    dh_pre = dh1 * dact(h1)                                # [B,T,h1] f32
    db1 = jnp.sum(dh_pre, axis=(0, 1))
    dpc = dh_pre.astype(cdt)
    dp_sum = jnp.sum(dh_pre, axis=1).astype(cdt)           # [B,h1]

    # layer 1, per concat part (A = wq+wm broadcast over T; Bw = wk-wm; P=wp),
    # with the keys/q*k cotangent dots combined 64-wide like the forward:
    #   dck = dh_pre @ [Bw; P].T   ->  dkeys_s = dck[..., :K], d(q*k) = dck[..., K:]
    #   dwkp = ck.T @ dh_pre       ->  dBw = dwkp[:K], dP = dwkp[K:]
    dq = (jnp.dot(dp_sum, (wq + wm).T, preferred_element_type=_F32))
    dck = jnp.dot(dpc, wkp.T, preferred_element_type=_F32)   # [B,T,2K]
    dkeys_s, dprod = dck[..., :K], dck[..., K:]
    dq = dq + jnp.sum(dprod * keys_c.astype(_F32), axis=1)
    dkeys = dkeys + dkeys_s + dprod * q_c.astype(_F32)[:, None, :]

    dA = jnp.dot(q_c.T, dp_sum, preferred_element_type=_F32)
    dwkp = jnp.dot(ck.reshape(-1, 2 * K).T, dpc.reshape(-1, H1),
                   preferred_element_type=_F32)
    dBw, dP = dwkp[:K], dwkp[K:]
    dw1 = jnp.concatenate([dA, dBw, dA - dBw, dP], axis=0)

    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return (dq.astype(query.dtype), dkeys.astype(keys.dtype), dmask,
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dw3.astype(w3.dtype), db3.astype(b3.dtype))


din_attention_remat.defvjp(_din_remat_fwd, _din_remat_bwd)
