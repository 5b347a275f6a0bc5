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


def test_gru_remat_and_bf16_variants(rng):
    """remat must be bit-identical in forward and match gradients closely;
    bf16 gate compute must track f32 within bf16 tolerance (f32 carry/outs)."""
    B, T, D, H = 4, 6, 5, 4
    params = init_gru_params(jax.random.PRNGKey(6), D, H)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    att = jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0]] * 4, bool))

    def loss_gru(p, x, **kw):
        outs, h = gru(p, x, mask=mask, **kw)
        return jnp.sum(outs * outs) + jnp.sum(h)

    base = loss_gru(params, x)
    gbase = jax.grad(loss_gru, argnums=(0, 1))(params, x)
    # remat: same math, same forward value, same gradients
    np.testing.assert_allclose(float(loss_gru(params, x, remat=True)),
                               float(base), rtol=1e-6)
    gremat = jax.grad(lambda p, x: loss_gru(p, x, remat=True),
                      argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gbase), jax.tree.leaves(gremat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # bf16 gates: outputs still f32, close to f32 math
    outs16, h16 = gru(params, x, mask=mask, dtype=jnp.bfloat16)
    assert outs16.dtype == jnp.float32
    outs32, _ = gru(params, x, mask=mask)
    np.testing.assert_allclose(np.asarray(outs16), np.asarray(outs32),
                               rtol=0.1, atol=0.05)

    def loss_augru(p, x, a, **kw):
        outs, h = augru(p, x, a, mask=mask, **kw)
        return jnp.sum(h)

    np.testing.assert_allclose(float(loss_augru(params, x, att, remat=True)),
                               float(loss_augru(params, x, att)), rtol=1e-6)
    ga = jax.grad(loss_augru, argnums=(0, 1, 2))(params, x, att)
    gar = jax.grad(lambda p, x, a: loss_augru(p, x, a, remat=True),
                   argnums=(0, 1, 2))(params, x, att)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gar)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
