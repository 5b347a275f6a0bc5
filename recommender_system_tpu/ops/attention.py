"""Public DIN target-attention op with jax/Pallas dispatch.

``din_attention`` scores a behavior sequence against a target query with a
2-hidden-layer MLP over ``[q, k, q-k, q*k]`` features, masks invalid steps,
optionally softmax-normalizes, and pools the values — the fused TPU kernel
(``pallas_kernels.din_attention_fused``) does all of it in VMEM.

Reference semantics: ``Attention.call`` (``layer/interaction.py:369-406``) and
``AttentionSequencePoolingLayer``/``LocalActivationUnit``
(``layer/sequence.py:180-290``, ``layer/core.py:28-120``).
"""
from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp

from . import dispatch
from .din_vjp import din_attention_remat
from .pallas_kernels import din_attention_fused, din_attention_ref


def din_attention(query, keys, mask, w1, b1, w2, b2, w3, b3,
                  activation: str = "sigmoid",
                  weight_normalization: bool = True,
                  return_scores: bool = False,
                  use_pallas: Optional[bool] = None,
                  dtype=None,
                  remat: bool = False):
    """query [B,K], keys [B,T,K], mask [B,T] -> pooled [B,K] (or scores [B,T]).

    ``dtype`` sets the scorer compute dtype on the XLA path (f32 accumulation,
    f32 softmax/pooling); the Pallas kernel computes in f32 and ignores it.

    ``remat=True`` (default) uses the hand-written backward
    (``ops.din_vjp.din_attention_remat``): only the inputs + [B,T] scores are
    saved and the scorer is recomputed per-part in the VJP, so the [B,T,h]
    activation residuals never stream to HBM.  Forward math is identical;
    set ``remat=False`` for plain autodiff (e.g. for grad-of-grad).
    """
    if dispatch.use_pallas(use_pallas):
        if dtype is not None:
            warnings.warn(
                "din_attention: the Pallas kernel computes in f32; "
                f"dtype={dtype} is ignored on this path", stacklevel=2)
        return din_attention_fused(
            query, keys, mask.astype(jnp.float32), w1, b1, w2, b2, w3, b3,
            activation, weight_normalization, return_scores)
    if remat:
        dtype_name = None if dtype is None else jnp.dtype(dtype).name
        return din_attention_remat(
            query, keys, mask.astype(bool), w1, b1, w2, b2, w3, b3,
            activation, weight_normalization, return_scores, dtype_name)
    return din_attention_ref(
        query, keys, mask.astype(bool), w1, b1, w2, b2, w3, b3,
        activation, weight_normalization, return_scores, dtype=dtype)
