"""NLP block tests: MHA masking, positional encoding, transformer plumbing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommender_system_tpu.layers.nlp import (MultiHeadAttention,
                                               ScaledEmbedding, causal_mask,
                                               sinusoidal_pe)
from recommender_system_tpu.models import Transformer


def test_sinusoidal_pe_values():
    pe = np.asarray(sinusoidal_pe(50, 16))
    assert pe.shape == (50, 16)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)   # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)   # cos(0)
    np.testing.assert_allclose(pe[3, 0], np.sin(3.0), rtol=1e-6)


def test_causal_mask_is_lower_triangular():
    m = np.asarray(causal_mask(4))
    np.testing.assert_array_equal(m, np.tril(np.ones((4, 4), bool)))


def test_mha_causal_ignores_future(rng):
    """With causal masking, output at position t must not depend on tokens > t."""
    B, T, D = 2, 6, 16
    x1 = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    x2 = x1.at[:, -1, :].set(999.0)  # perturb only the last position
    mha = MultiHeadAttention(num_heads=4, model_dim=D, causal=True)
    variables = mha.init(jax.random.PRNGKey(0), x1, x1)
    o1 = np.asarray(mha.apply(variables, x1, x1))
    o2 = np.asarray(mha.apply(variables, x2, x2))
    np.testing.assert_allclose(o1[:, :-1], o2[:, :-1], rtol=1e-4, atol=1e-4)
    assert np.abs(o1[:, -1] - o2[:, -1]).max() > 1e-3


def test_mha_padding_mask_ignores_padded_keys(rng):
    B, T, D = 2, 5, 8
    x1 = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    x2 = x1.at[:, -2:, :].set(123.0)
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0]] * B, bool))
    mha = MultiHeadAttention(num_heads=2, model_dim=D)
    variables = mha.init(jax.random.PRNGKey(0), x1, x1)
    o1 = np.asarray(mha.apply(variables, x1[:, :3], x1,
                              key_padding_mask=mask))
    o2 = np.asarray(mha.apply(variables, x1[:, :3], x2,
                              key_padding_mask=mask))
    np.testing.assert_allclose(o1, o2, rtol=1e-5)  # padded keys can't leak


def test_scaled_embedding_tied_projection(rng):
    emb = ScaledEmbedding(vocab_size=20, dim=8)
    ids = jnp.asarray(rng.integers(0, 20, (2, 3)))
    variables = emb.init(jax.random.PRNGKey(0), ids)
    out = emb.apply(variables, ids)
    table = np.asarray(variables["params"]["table"])
    np.testing.assert_allclose(np.asarray(out),
                               table[np.asarray(ids)] * np.sqrt(8.0),
                               rtol=1e-6)
    logits = emb.apply(variables, np.asarray(out[0]), method=emb.attend)
    assert logits.shape == (3, 20)


def test_transformer_decoder_causality(rng):
    """Changing a later target token must not change earlier output logits."""
    model = Transformer(vocab_size=30, model_dim=16, num_heads=2,
                        num_layers=1, ffn_dim=32, max_len=8)
    src = jnp.asarray(rng.integers(1, 30, (1, 8)))
    tgt1 = jnp.asarray(rng.integers(1, 30, (1, 6)))
    tgt2 = tgt1.at[0, -1].set((int(tgt1[0, -1]) % 29) + 1)
    variables = model.init(jax.random.PRNGKey(0), src, tgt1)
    o1 = np.asarray(model.apply(variables, src, tgt1))
    o2 = np.asarray(model.apply(variables, src, tgt2))
    np.testing.assert_allclose(o1[:, :-1], o2[:, :-1], rtol=1e-4, atol=1e-4)
