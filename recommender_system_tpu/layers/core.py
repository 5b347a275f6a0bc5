"""Core neural building blocks: DNN tower, Dice/PReLU activations, prediction head.

Flax-linen redesign of the reference's Keras blocks:
- ``DNN``            <- ``DNNLayer`` (``layer/interaction.py:30-46``) and the
                        DeepCTR ``DNN`` (``layer/core.py:123-220``), unified.
- ``Dice``           <- the duplicated Dice implementations
                        (``layer/activation.py:32-74``, ``layer/interaction.py:410-425``)
                        — one canonical version.
- ``PredictionLayer``<- ``layer/core.py:223-264``.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Parametric ReLU with per-channel slope (keras ``PReLU()`` parity)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha * x)


class Dice(nn.Module):
    """Data-adaptive activation from DIN.

    ``alpha*(1-p)*x + p*x`` where ``p = sigmoid(batchnorm(x))`` with a scale/center-
    free BatchNorm — parity with ``layer/activation.py:32-74``.
    """

    epsilon: float = 1e-9

    @nn.compact
    def __call__(self, x, train: bool = False):
        normed = nn.BatchNorm(
            use_running_average=not train,
            use_bias=False, use_scale=False,
            epsilon=self.epsilon, momentum=0.9,
        )(x)
        p = jax.nn.sigmoid(normed)
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],))
        return alpha * (1.0 - p) * x + p * x


def activation_fn(name: Optional[str]) -> Callable:
    """str -> activation fn registry (parity: ``layer/activation.py:77-87``).

    'dice' and 'prelu' are parametric and handled inside ``DNN``; this covers the
    stateless ones.
    """
    if name is None or name == "linear":
        return lambda x: x
    table = {
        "relu": jax.nn.relu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "softmax": jax.nn.softmax,
        "elu": jax.nn.elu,
        "gelu": jax.nn.gelu,
        "hard_sigmoid": jax.nn.hard_sigmoid,
    }
    if name not in table:
        raise ValueError(f"Unknown activation {name!r}")
    return table[name]


class DNN(nn.Module):
    """MLP tower with optional BN, dropout, parametric activations, linear head.

    Unifies ``DNNLayer`` (``layer/interaction.py:30-46``: Dense stack + dropout +
    linear output) and DeepCTR ``DNN`` (``layer/core.py:123-220``: per-layer BN /
    dropout / configurable output activation). ``output_dim=None`` returns the last
    hidden activation (DeepCTR behavior); otherwise a linear head of that width is
    appended (DNNLayer behavior).
    """

    hidden_units: Sequence[int]
    activation: str = "relu"
    dropout_rate: float = 0.0
    use_bn: bool = False
    output_dim: Optional[int] = None
    output_activation: Optional[str] = None
    kernel_init: Callable = nn.initializers.glorot_uniform()
    # compute dtype for the Dense layers (params stay f32). 'bfloat16'
    # halves the tower's HBM activation traffic on TPU; the output head
    # always accumulates/returns f32.
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, units in enumerate(self.hidden_units):
            x = nn.Dense(units, kernel_init=self.kernel_init, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=f"bn_{i}")(x)
            if self.activation == "dice":
                x = Dice(name=f"dice_{i}")(x, train=train)
            elif self.activation == "prelu":
                x = PReLU(name=f"prelu_{i}")(x)
            else:
                x = activation_fn(self.activation)(x)
            if self.dropout_rate > 0.0:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, kernel_init=self.kernel_init,
                         name="output")(x.astype(jnp.float32))
            x = activation_fn(self.output_activation)(x)
        return x.astype(jnp.float32)


class PredictionLayer(nn.Module):
    """Task head: global bias + link function (``layer/core.py:223-264``).

    task='binary' applies sigmoid; 'regression'/'multiclass' return raw values.
    Call with ``logits=True`` to skip the link (for loss-from-logits training).
    """

    task: str = "binary"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, logits: bool = False):
        if self.use_bias:
            bias = self.param("global_bias", nn.initializers.zeros, (1,))
            x = x + bias
        if self.task == "binary" and not logits:
            x = jax.nn.sigmoid(x)
        return x.reshape(-1, 1) if x.ndim == 1 else x
