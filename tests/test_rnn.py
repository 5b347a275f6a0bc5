"""GRU / AUGRU / LSTM scan tests vs step-by-step numpy references."""
import numpy as np

import jax
import jax.numpy as jnp

from recommender_system_tpu.ops.rnn import (GRUParams, augru, gru,
                                            init_gru_params, init_lstm_params,
                                            lstm)


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_gru_step(params, x_t, h, att=None):
    H = params.wh.shape[0]
    wx, wh = np.asarray(params.wx), np.asarray(params.wh)
    b = np.asarray(params.bias) if params.bias is not None else 0.0
    px = x_t @ wx + b
    ph = h @ wh[:, : 2 * H]
    z = _np_sigmoid(px[:, :H] + ph[:, :H])
    r = _np_sigmoid(px[:, H: 2 * H] + ph[:, H: 2 * H])
    hh = np.tanh(px[:, 2 * H:] + (r * h) @ wh[:, 2 * H:])
    if att is None:
        return z * h + (1 - z) * hh
    u = att[:, None] * (1 - z)
    return (1 - u) * h + u * hh


def test_gru_matches_stepwise(rng):
    B, T, D, H = 3, 5, 4, 6
    params = init_gru_params(jax.random.PRNGKey(0), D, H)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    outs, h_last = gru(params, jnp.asarray(x))
    h = np.zeros((B, H), np.float32)
    for t in range(T):
        h = _np_gru_step(params, x[:, t], h)
        np.testing.assert_allclose(np.asarray(outs)[:, t], h, rtol=1e-4,
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), h, rtol=1e-4, atol=1e-5)


def test_gru_mask_carries_state(rng):
    B, T, D, H = 2, 4, 3, 5
    params = init_gru_params(jax.random.PRNGKey(1), D, H)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    mask = np.array([[1, 1, 0, 0], [1, 1, 1, 1]], bool)
    outs, h_last = gru(params, jnp.asarray(x), mask=jnp.asarray(mask))
    # row 0: state frozen after step 1
    np.testing.assert_allclose(np.asarray(outs)[0, 1], np.asarray(outs)[0, 3],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h_last)[0], np.asarray(outs)[0, 1],
                               rtol=1e-6)


def test_augru_att_zero_keeps_state(rng):
    B, T, D, H = 2, 4, 3, 5
    params = init_gru_params(jax.random.PRNGKey(2), D, H)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    att = np.zeros((B, T), np.float32)
    outs, h_last = augru(params, jnp.asarray(x), jnp.asarray(att))
    np.testing.assert_allclose(np.asarray(h_last), np.zeros((B, H)), atol=1e-7)


def test_augru_att_one_equals_gru(rng):
    B, T, D, H = 2, 4, 3, 5
    params = init_gru_params(jax.random.PRNGKey(3), D, H)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    att = np.ones((B, T), np.float32)
    _, h_augru = augru(params, jnp.asarray(x), jnp.asarray(att))
    _, h_gru = gru(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(h_augru), np.asarray(h_gru),
                               rtol=1e-5, atol=1e-6)


def test_augru_matches_stepwise(rng):
    B, T, D, H = 3, 4, 5, 4
    params = init_gru_params(jax.random.PRNGKey(4), D, H, use_bias=False)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    att = rng.uniform(size=(B, T)).astype(np.float32)
    outs, h_last = augru(params, jnp.asarray(x), jnp.asarray(att))
    h = np.zeros((B, H), np.float32)
    for t in range(T):
        h = _np_gru_step(params, x[:, t], h, att=att[:, t])
    np.testing.assert_allclose(np.asarray(h_last), h, rtol=1e-4, atol=1e-5)


def test_lstm_shapes_and_mask(rng):
    B, T, D, H = 2, 6, 4, 3
    params = init_lstm_params(jax.random.PRNGKey(5), D, H)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0, 0], [1] * 6], bool)
    outs, (h, c) = lstm(params, jnp.asarray(x), mask=jnp.asarray(mask))
    assert outs.shape == (B, T, H)
    np.testing.assert_allclose(np.asarray(outs)[0, 2], np.asarray(h)[0],
                               rtol=1e-6)
