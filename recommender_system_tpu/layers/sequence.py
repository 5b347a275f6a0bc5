"""Behavior-sequence attention: DIN target attention / attention sequence pooling.

Flax counterpart of ``Attention`` (``layer/interaction.py:355-406``),
``LocalActivationUnit`` (``layer/core.py:28-120``) and
``AttentionSequencePoolingLayer`` (``layer/sequence.py:180-290``): tile the query
over time, score ``concat([q, k, q-k, q*k])`` with a small MLP, mask with -2^32,
softmax (optional), and pool the values.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.rnn import GRUParams, _orthogonal_3h, augru, gru
from ..ops.seqpool import NEG_INF, masked_softmax
from .core import DNN


class DinAttention(nn.Module):
    """Target attention pooling over a behavior sequence.

    ``query [B, k]``, ``keys/values [B, T, k]``, ``mask [B, T]`` ->
    pooled ``[B, k]`` (or scores ``[B, T]`` with ``return_score=True``).

    ``weight_normalization=True`` applies masked softmax to the scores (DIN default
    in the standalone ``Attention``; ``AttentionSequencePoolingLayer`` exposes it as
    a flag, ``layer/sequence.py:214``). With False, invalid positions score 0.

    On TPU the whole op (concat-folded MLP scorer + mask + softmax + pooling)
    runs as one Pallas kernel (``ops.pallas_kernels.din_attention_fused``) when
    the scorer has exactly 2 hidden layers and a sigmoid/relu activation;
    otherwise (dice/prelu or other depths) it falls back to the DNN path.
    """

    hidden_units: Sequence[int] = (80, 40)
    activation: str = "sigmoid"
    weight_normalization: bool = True
    return_score: bool = False
    use_pallas: Optional[bool] = None
    # scorer compute dtype ('bfloat16' on TPU; params/softmax/pooling stay f32)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query, keys, mask, values=None, train: bool = False):
        from ..ops.attention import din_attention

        K = keys.shape[-1]
        fusable = (len(self.hidden_units) == 2
                   and self.activation in ("sigmoid", "relu")
                   and values is None)
        if fusable:
            h1, h2 = self.hidden_units
            glorot = nn.initializers.glorot_uniform()
            w1 = self.param("w1", glorot, (4 * K, h1))
            b1 = self.param("b1", nn.initializers.zeros, (h1,))
            w2 = self.param("w2", glorot, (h1, h2))
            b2 = self.param("b2", nn.initializers.zeros, (h2,))
            w3 = self.param("w3", glorot, (h2, 1))
            b3 = self.param("b3", nn.initializers.zeros, (1,))
            return din_attention(
                query, keys, mask, w1, b1, w2, b2, w3, b3,
                activation=self.activation,
                weight_normalization=self.weight_normalization,
                return_scores=self.return_score, use_pallas=self.use_pallas,
                dtype=self.dtype)

        if values is None:
            values = keys
        q = jnp.broadcast_to(query[:, None, :], keys.shape)  # tile over T
        att_in = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)
        score = DNN(self.hidden_units, activation=self.activation, dtype=self.dtype,
                    output_dim=1, name="local_activation_unit")(att_in, train=train)
        score = score[..., 0]  # [B, T]
        if self.weight_normalization:
            score = masked_softmax(score, mask, axis=-1)
        else:
            score = jnp.where(mask, score, 0.0)
        if self.return_score:
            return score
        return jnp.einsum("bt,btk->bk", score, values,
                          preferred_element_type=jnp.float32)


class _RecurrentBase(nn.Module):
    """Shared param plumbing for GRU/AUGRU flax wrappers (``ops.rnn``)."""

    hidden: int
    use_bias: bool = True
    # gate-matmul compute dtype (params/carry stay f32, f32 accumulation);
    # bf16 + remat measured 2.56 -> 0.82 ms GRU fwd+bwd at the DIEN shape
    # (benchmarks/rnn_variants.py, v5e 2026-08-21)
    dtype: Optional[jnp.dtype] = None

    def _params(self, input_dim: int) -> GRUParams:
        scale = 1.0 / jnp.sqrt(input_dim)
        wx = self.param("wx", nn.initializers.uniform(scale=2 * scale),
                        (input_dim, 3 * self.hidden))
        wx = wx - scale  # uniform(-scale, scale)
        wh = self.param("wh", lambda k, s: _orthogonal_3h(k, self.hidden, jnp.float32),
                        (self.hidden, 3 * self.hidden))
        bias = (self.param("bias", nn.initializers.zeros, (3 * self.hidden,))
                if self.use_bias else None)
        return GRUParams(wx, wh, bias)


class GRULayer(_RecurrentBase):
    """GRU over [B, T, D] -> (outputs [B, T, H], final [B, H]).
    Replaces keras ``GRU(return_sequences=True)`` (``model/dien.py:65``)."""

    @nn.compact
    def __call__(self, inputs, mask=None):
        return gru(self._params(inputs.shape[-1]), inputs, mask=mask,
                   dtype=self.dtype)


class AUGRULayer(_RecurrentBase):
    """Attention-gated GRU (``AUGRU``, ``layer/sequence.py:293`` +
    ``AUGRUCell``, ``layer/activation.py:91-142``)."""

    @nn.compact
    def __call__(self, inputs, att_scores, mask=None):
        return augru(self._params(inputs.shape[-1]), inputs, att_scores,
                     mask=mask, dtype=self.dtype)
