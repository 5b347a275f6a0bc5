"""Harness tests: losses, checkpoint round-trip, predict padding."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recommender_system_tpu.models import FM
from recommender_system_tpu.training import (NegativeSampler, Trainer,
                                             bce_with_logits,
                                             inbatch_softmax_loss,
                                             sampled_softmax_loss)
from recommender_system_tpu.training.checkpoint import (restore_checkpoint,
                                                        save_checkpoint)
from recommender_system_tpu.utils.datasets import iter_batches, synthetic_criteo


def test_bce_matches_manual():
    logits = jnp.asarray([0.5, -1.0, 2.0])
    labels = jnp.asarray([1.0, 0.0, 1.0])
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    expected = -np.mean(np.asarray(labels) * np.log(p)
                        + (1 - np.asarray(labels)) * np.log(1 - p))
    np.testing.assert_allclose(float(bce_with_logits(logits, labels)),
                               expected, rtol=1e-6)


def test_bce_weighted():
    logits = jnp.asarray([10.0, -10.0])
    labels = jnp.asarray([0.0, 0.0])
    w = jnp.asarray([0.0, 1.0])  # ignore the bad first example
    assert float(bce_with_logits(logits, labels, w)) < 1e-3


def test_inbatch_softmax_perfect_alignment():
    # orthogonal user/item embeddings -> near-zero loss
    u = jnp.eye(4) * 20.0
    v = jnp.eye(4) * 1.0
    ids = jnp.arange(4)
    loss = float(inbatch_softmax_loss(u, v, ids))
    assert loss < 1e-3


def test_inbatch_softmax_logq_correction_changes_loss():
    u = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)),
                    jnp.float32)
    v = jnp.asarray(np.random.default_rng(1).normal(size=(8, 4)),
                    jnp.float32)
    ids = jnp.arange(8)
    probs = jnp.asarray(np.linspace(0.01, 0.5, 8), jnp.float32)
    l0 = float(inbatch_softmax_loss(u, v, ids))
    l1 = float(inbatch_softmax_loss(u, v, ids, item_probs=probs))
    assert abs(l0 - l1) > 1e-4


def test_sampled_softmax_runs():
    rng = jax.random.PRNGKey(0)
    u = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)), jnp.float32)
    table = jnp.asarray(np.random.default_rng(1).normal(size=(100, 8)),
                        jnp.float32)
    pos = jnp.asarray(np.random.default_rng(2).integers(1, 100, 16))
    for sampler in [NegativeSampler("uniform", num_sampled=20),
                    NegativeSampler("frequency", num_sampled=20,
                                    item_probs=np.ones(100) / 100,
                                    distortion=0.75)]:
        loss = float(sampled_softmax_loss(u, table, pos, sampler, rng))
        assert np.isfinite(loss) and loss > 0


def test_adaptive_sampler_learns_unigram():
    """'adaptive' (learned unigram, utils/negative.py:30): items seen often
    as positives get proposed as negatives proportionally more often."""
    from recommender_system_tpu.training.losses import (
        init_adaptive_counts, update_adaptive_counts)

    rng = jax.random.PRNGKey(0)
    n_items = 50
    counts = init_adaptive_counts(n_items)
    # feed batches where item 7 dominates the positives
    pos = jnp.asarray([7] * 30 + [3, 11])
    for _ in range(20):
        counts = update_adaptive_counts(counts, pos)
    assert float(counts[7]) > 10 * float(counts[3])

    u = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)), jnp.float32)
    table = jnp.asarray(np.random.default_rng(1).normal(size=(n_items, 8)),
                        jnp.float32)
    sampler = NegativeSampler("adaptive", num_sampled=2000, distortion=1.0)
    loss = float(sampled_softmax_loss(u, table, pos[:16], sampler, rng,
                                      adaptive_counts=counts))
    assert np.isfinite(loss) and loss > 0
    # the proposal really follows the learned counts: sample negatives
    # directly and check item 7 dominates the draws
    p = counts / counts.sum()
    neg = jax.random.categorical(rng, jnp.log(p), shape=(2000,))
    frac7 = float(jnp.mean(neg == 7))
    assert frac7 > 0.5, frac7

    # missing state is a hard error, not silent uniform
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sampled_softmax_loss(u, table, pos[:16], sampler, rng)


def test_checkpoint_roundtrip(tmp_path):
    cols, X, y = synthetic_criteo(n_rows=128, vocab=30)
    model = FM(tuple(cols))
    tr = Trainer(model)
    state = tr.init(next(iter_batches(X, y, 32))[0])
    state, _ = tr.fit(state, X, y, batch_size=32, epochs=1)
    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    fresh = tr.init(next(iter_batches(X, y, 32))[0])
    restored = restore_checkpoint(str(tmp_path / "ckpt"), fresh)
    a = np.asarray(state.params["unified"]["embeddings"]["table_d9"])
    b = np.asarray(restored.params["unified"]["embeddings"]["table_d9"])
    np.testing.assert_allclose(a, b)
    assert int(restored.step) == int(state.step)


def test_predict_handles_partial_batches():
    cols, X, y = synthetic_criteo(n_rows=100, vocab=30)
    model = FM(tuple(cols))
    tr = Trainer(model)
    state = tr.init(next(iter_batches(X, y, 32))[0])
    probs = tr.predict(state, X, batch_size=32)
    assert probs.shape[0] == 100
    assert np.all((probs >= 0) & (probs <= 1))
