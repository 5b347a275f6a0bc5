"""Parametric interaction modules: FM, CrossNet, products, AFM, residual, FGCNN, MMoE.

Flax counterparts of ``/root/reference/algorithm/deep_learning/layer/interaction.py``
built on the fused ops in ``ops/interactions.py``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interactions import (bi_interaction, cross_network, fm_interaction,
                                pairwise_inner, pairwise_outer, pairwise_product)
from .core import DNN, activation_fn


class FMLayer(nn.Module):
    """Full FM (first + second order) on a dense/one-hot input ``[B, D]``.

    Parity with ``FMLayer`` (``layer/interaction.py:86-114``): w0 + X.w1 +
    0.5*sum((Xv)^2 - X^2 v^2). Returns the raw logit ``[B, 1]``.
    On TPU this runs as one Pallas kernel (``ops.pallas_kernels.fm_fused``).
    """

    factor_dim: int
    init_std: float = 0.05
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        from ..ops import dispatch
        from ..ops.pallas_kernels import fm_fused

        d = x.shape[-1]
        w0 = self.param("w0", nn.initializers.zeros, (1,))
        w1 = self.param("w1", nn.initializers.normal(self.init_std), (d, 1))
        v = self.param("v", nn.initializers.normal(self.init_std),
                       (d, self.factor_dim))
        if dispatch.use_pallas(self.use_pallas):
            return fm_fused(x, w1, v) + w0
        linear = jnp.dot(x, w1, preferred_element_type=jnp.float32) + w0
        return linear + fm_interaction(x, v)


class CrossNet(nn.Module):
    """DCN cross network stack (``CrossLayer``, ``layer/interaction.py:49-83``).
    On TPU the full L-layer recurrence runs as one Pallas kernel
    (``ops.pallas_kernels.cross_fused``)."""

    num_layers: int
    init_std: float = 0.05
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        from ..ops import dispatch
        from ..ops.pallas_kernels import cross_fused

        d = x.shape[-1]
        ws = self.param("weights", nn.initializers.normal(self.init_std),
                        (self.num_layers, d))
        bs = self.param("biases", nn.initializers.normal(self.init_std),
                        (self.num_layers, d))
        if dispatch.use_pallas(self.use_pallas):
            return cross_fused(x, ws, bs)
        return cross_network(x, ws, bs)


class InnerProductLayer(nn.Module):
    """PNN inner products (stateless; ``layer/interaction.py:166-183``)."""

    @nn.compact
    def __call__(self, embeds):
        return pairwise_inner(embeds)


class OuterProductLayer(nn.Module):
    """PNN kernel-weighted outer products (``layer/interaction.py:186-215``)."""

    init_std: float = 0.05

    @nn.compact
    def __call__(self, embeds):
        F, k = embeds.shape[1], embeds.shape[2]
        pairs = F * (F - 1) // 2
        kernel = self.param("kernel", nn.initializers.normal(self.init_std),
                            (k, pairs, k))
        return pairwise_outer(embeds, kernel)


class AFMAttention(nn.Module):
    """Attention pooling over interaction pairs (``AttentionLayer``,
    ``layer/interaction.py:300-319``): Dense(relu) -> Dense(1) -> softmax ->
    weighted sum over the pair axis."""

    attention_units: int

    @nn.compact
    def __call__(self, pair_embeds):  # [B, P, k]
        score = nn.Dense(self.attention_units, name="att_w")(pair_embeds)
        score = jax.nn.relu(score)
        score = nn.Dense(1, name="att_h")(score)  # [B, P, 1]
        att = jax.nn.softmax(score, axis=1)
        return jnp.sum(att * pair_embeds, axis=1)  # [B, k]


class ResBlock(nn.Module):
    """DeepCrossing residual unit: ``relu(x + MLP(x))``
    (``ResLayer``, ``layer/interaction.py:261-278``)."""

    hidden_units: Sequence[int]

    @nn.compact
    def __call__(self, x):
        h = x
        for i, units in enumerate(self.hidden_units):
            h = jax.nn.relu(nn.Dense(units, name=f"dense_{i}")(h))
        h = nn.Dense(x.shape[-1], name="proj")(h)
        return jax.nn.relu(x + h)


class FGCNN(nn.Module):
    """Feature-generation CNN (``FGCNNLayer``, ``layer/interaction.py:218-258``):
    per stage Conv(tanh) -> MaxPool -> Dense(relu) recombination producing extra
    feature maps ``[B, F_new, k]``. (The reference builds its Dense inside ``call``
    — a retracing hazard; here everything is a proper parameter.)"""

    filters: Sequence[int] = (14, 16)
    kernel_width: Sequence[int] = (7, 7)
    dnn_maps: Sequence[int] = (3, 3)
    pooling_width: Sequence[int] = (2, 2)

    @nn.compact
    def __call__(self, embeds):  # [B, F, k]
        k = embeds.shape[-1]
        x = embeds[..., None]  # [B, F, k, 1] (NHWC)
        new_maps = []
        for i, (f, kw, maps, pw) in enumerate(zip(
                self.filters, self.kernel_width, self.dnn_maps, self.pooling_width)):
            x = nn.Conv(f, kernel_size=(kw, 1), padding="SAME", name=f"conv_{i}")(x)
            x = jnp.tanh(x)
            x = nn.max_pool(x, window_shape=(pw, 1), strides=(pw, 1))
            flat = x.reshape(x.shape[0], -1)
            h = x.shape[1]
            out = jax.nn.relu(nn.Dense(maps * h * k, name=f"recomb_{i}")(flat))
            new_maps.append(out.reshape(x.shape[0], maps * h, k))
        return jnp.concatenate(new_maps, axis=1)  # [B, F_new, k]


class MMoELayer(nn.Module):
    """Multi-gate mixture-of-experts (``mmoe_layer``,
    ``layer/interaction.py:429-509``): experts ``[D, H, E]`` + per-task gates,
    computed as two einsums (expert matmul batched onto the MXU instead of the
    reference's per-expert Python loop)."""

    num_experts: int
    expert_units: int
    num_tasks: int
    use_expert_bias: bool = True
    use_gate_bias: bool = True
    init_std: float = 0.05

    @nn.compact
    def __call__(self, x):  # [B, D]
        d = x.shape[-1]
        w_expert = self.param("experts", nn.initializers.normal(self.init_std),
                              (d, self.expert_units, self.num_experts))
        expert_out = jnp.einsum("bd,dhe->bhe", x, w_expert,
                                preferred_element_type=jnp.float32)
        if self.use_expert_bias:
            b_expert = self.param("expert_bias",
                                  nn.initializers.normal(self.init_std),
                                  (self.expert_units, self.num_experts))
            expert_out = expert_out + b_expert
        expert_out = jax.nn.relu(expert_out)  # [B, H, E]

        w_gate = self.param("gates", nn.initializers.normal(self.init_std),
                            (self.num_tasks, d, self.num_experts))
        gate_logits = jnp.einsum("bd,tde->bte", x, w_gate,
                                 preferred_element_type=jnp.float32)
        if self.use_gate_bias:
            b_gate = self.param("gate_bias", nn.initializers.normal(self.init_std),
                                (self.num_tasks, self.num_experts))
            gate_logits = gate_logits + b_gate
        gates = jax.nn.softmax(gate_logits, axis=-1)  # [B, T, E]

        task_outs = jnp.einsum("bhe,bte->bth", expert_out, gates,
                               preferred_element_type=jnp.float32)
        return [task_outs[:, t, :] for t in range(self.num_tasks)]


class TowerLayer(nn.Module):
    """Per-task output tower (``tower_layer``, ``layer/interaction.py:512-523``)."""

    hidden_units: Sequence[int]
    output_dim: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        for i, units in enumerate(self.hidden_units):
            x = activation_fn(self.activation)(nn.Dense(units, name=f"dense_{i}")(x))
        return nn.Dense(self.output_dim, name="output")(x)
