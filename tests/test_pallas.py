"""Pallas kernel tests (interpret mode on CPU): fused == pure-jax reference,
forward and gradients."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommender_system_tpu.ops.interactions import cross_network
from recommender_system_tpu.ops.pallas_kernels import (_fm_ref, cross_fused,
                                                       din_attention_fused,
                                                       din_attention_ref,
                                                       fm_fused)


def test_fm_fused_matches_ref(rng):
    B, D, K = 64, 40, 8
    x = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(D, 1)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(D, K)), jnp.float32)
    np.testing.assert_allclose(np.asarray(fm_fused(x, w1, v)),
                               np.asarray(_fm_ref(x, w1, v)),
                               rtol=1e-4, atol=1e-4)


def test_fm_fused_gradients(rng):
    B, D, K = 16, 10, 4
    x = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(D, 1)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(D, K)), jnp.float32)

    g_fused = jax.grad(lambda *a: jnp.sum(fm_fused(*a) ** 2), argnums=(0, 1, 2))(
        x, w1, v)
    g_ref = jax.grad(lambda *a: jnp.sum(_fm_ref(*a) ** 2), argnums=(0, 1, 2))(
        x, w1, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)


def test_cross_fused_matches_ref(rng):
    B, D, L = 32, 24, 4
    x0 = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    ws = jnp.asarray(rng.normal(size=(L, D)) * 0.1, jnp.float32)
    bs = jnp.asarray(rng.normal(size=(L, D)) * 0.1, jnp.float32)
    np.testing.assert_allclose(np.asarray(cross_fused(x0, ws, bs)),
                               np.asarray(cross_network(x0, ws, bs)),
                               rtol=1e-4, atol=1e-4)


def test_cross_fused_gradients(rng):
    B, D, L = 8, 12, 3
    x0 = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    ws = jnp.asarray(rng.normal(size=(L, D)) * 0.1, jnp.float32)
    bs = jnp.asarray(rng.normal(size=(L, D)) * 0.1, jnp.float32)
    g_fused = jax.grad(lambda *a: jnp.sum(cross_fused(*a) ** 2),
                       argnums=(0, 1, 2))(x0, ws, bs)
    g_ref = jax.grad(lambda *a: jnp.sum(cross_network(*a) ** 2),
                     argnums=(0, 1, 2))(x0, ws, bs)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)


def _din_args(rng, B=16, T=6, K=8, H1=10, H2=5):
    q = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    keys = jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32)
    lengths = rng.integers(1, T + 1, B)
    mask = (np.arange(T)[None, :] < lengths[:, None])
    w1 = jnp.asarray(rng.normal(size=(4 * K, H1)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(H1,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H1, H2)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(H2,)) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(H2, 1)) * 0.3, jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32)
    return q, keys, jnp.asarray(mask), w1, b1, w2, b2, w3, b3


@pytest.mark.parametrize("weight_norm", [True, False])
@pytest.mark.parametrize("activation", ["sigmoid", "relu"])
def test_din_fused_matches_ref(rng, weight_norm, activation):
    q, keys, mask, w1, b1, w2, b2, w3, b3 = _din_args(rng)
    fused = din_attention_fused(q, keys, mask.astype(jnp.float32),
                                w1, b1, w2, b2, w3, b3,
                                activation, weight_norm, False)
    ref = din_attention_ref(q, keys, mask, w1, b1, w2, b2, w3, b3,
                            activation, weight_norm, False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_din_fused_scores_match_ref(rng):
    q, keys, mask, w1, b1, w2, b2, w3, b3 = _din_args(rng)
    fused = din_attention_fused(q, keys, mask.astype(jnp.float32),
                                w1, b1, w2, b2, w3, b3, "sigmoid", True, True)
    ref = din_attention_ref(q, keys, mask, w1, b1, w2, b2, w3, b3,
                            "sigmoid", True, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_din_fused_gradients(rng):
    q, keys, mask, w1, b1, w2, b2, w3, b3 = _din_args(rng, B=8, T=4, K=4)
    maskf = mask.astype(jnp.float32)

    def loss_fused(q, keys, w1, w2, w3):
        out = din_attention_fused(q, keys, maskf, w1, b1, w2, b2, w3, b3,
                                  "sigmoid", True, False)
        return jnp.sum(out ** 2)

    def loss_ref(q, keys, w1, w2, w3):
        out = din_attention_ref(q, keys, mask, w1, b1, w2, b2, w3, b3,
                                "sigmoid", True, False)
        return jnp.sum(out ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, keys, w1, w2, w3)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, keys, w1, w2, w3)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)


def test_din_module_uses_fused_path_consistently(rng):
    """Module output identical with use_pallas True (interpret) vs False."""
    from recommender_system_tpu.layers.sequence import DinAttention

    B, T, K = 8, 5, 8
    q = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    keys = jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32)
    mask = jnp.asarray(np.ones((B, T), bool))
    mod_ref = DinAttention(hidden_units=(16, 8), use_pallas=False)
    variables = mod_ref.init(jax.random.PRNGKey(0), q, keys, mask)
    out_ref = mod_ref.apply(variables, q, keys, mask)
    mod_fused = DinAttention(hidden_units=(16, 8), use_pallas=True)
    out_fused = mod_fused.apply(variables, q, keys, mask)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
