"""Unit tests: every interaction op vs a brute-force numpy reference
(SURVEY.md §4 plan item (a))."""
import numpy as np
import pytest

import jax.numpy as jnp

from recommender_system_tpu.ops.interactions import (
    bi_interaction, cross_network, ffm_interaction, fm_interaction,
    pairwise_inner, pairwise_outer, pairwise_product)
from recommender_system_tpu.ops.seqpool import (
    length_mask, masked_softmax, sequence_pooling, weighted_sequence)


def test_fm_interaction_matches_bruteforce(rng):
    B, D, K = 7, 11, 5
    x = rng.normal(size=(B, D)).astype(np.float32)
    v = rng.normal(size=(D, K)).astype(np.float32)
    out = np.asarray(fm_interaction(jnp.asarray(x), jnp.asarray(v)))
    # brute force: sum_{i<j} <v_i, v_j> x_i x_j
    expected = np.zeros((B, 1))
    for i in range(D):
        for j in range(i + 1, D):
            expected[:, 0] += (v[i] @ v[j]) * x[:, i] * x[:, j]
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


def test_bi_interaction_equals_pairwise_sum(rng):
    B, F, K = 4, 6, 8
    e = rng.normal(size=(B, F, K)).astype(np.float32)
    bi = np.asarray(bi_interaction(jnp.asarray(e)))
    expected = np.zeros((B, K))
    for i in range(F):
        for j in range(i + 1, F):
            expected += e[:, i] * e[:, j]
    np.testing.assert_allclose(bi, expected, rtol=1e-4, atol=1e-5)


def test_pairwise_inner(rng):
    B, F, K = 3, 5, 4
    e = rng.normal(size=(B, F, K)).astype(np.float32)
    out = np.asarray(pairwise_inner(jnp.asarray(e)))
    cols = [(e[:, i] * e[:, j]).sum(-1)
            for i in range(F) for j in range(i + 1, F)]
    np.testing.assert_allclose(out, np.stack(cols, 1), rtol=1e-4, atol=1e-5)


def test_pairwise_product(rng):
    B, F, K = 3, 4, 6
    e = rng.normal(size=(B, F, K)).astype(np.float32)
    out = np.asarray(pairwise_product(jnp.asarray(e)))
    expected = np.stack([e[:, i] * e[:, j]
                         for i in range(F) for j in range(i + 1, F)], 1)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_pairwise_outer(rng):
    B, F, K = 2, 4, 3
    P = F * (F - 1) // 2
    e = rng.normal(size=(B, F, K)).astype(np.float32)
    w = rng.normal(size=(K, P, K)).astype(np.float32)
    out = np.asarray(pairwise_outer(jnp.asarray(e), jnp.asarray(w)))
    # reference formulation (layer/interaction.py:205-214)
    rows = [i for i in range(F) for j in range(i + 1, F)]
    cols = [j for i in range(F) for j in range(i + 1, F)]
    expected = np.zeros((B, P))
    for b in range(B):
        for p in range(P):
            pi, qj = e[b, rows[p]], e[b, cols[p]]
            expected[b, p] = sum(
                qj[jj] * (pi * w[jj, p, :]).sum() for jj in range(K))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_cross_network_recurrence(rng):
    B, D, L = 5, 7, 3
    x0 = rng.normal(size=(B, D)).astype(np.float32)
    ws = rng.normal(size=(L, D)).astype(np.float32)
    bs = rng.normal(size=(L, D)).astype(np.float32)
    out = np.asarray(cross_network(jnp.asarray(x0), jnp.asarray(ws),
                                   jnp.asarray(bs)))
    x = x0.copy()
    for l in range(L):
        xw = x @ ws[l]  # [B]
        x = x0 * xw[:, None] + bs[l][None] + x
    np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-4)


def test_ffm_interaction(rng):
    B, F, K = 3, 4, 2
    fe = rng.normal(size=(B, F, F, K)).astype(np.float32)
    out = np.asarray(ffm_interaction(jnp.asarray(fe)))
    expected = np.zeros((B, 1))
    for i in range(F):
        for j in range(i + 1, F):
            expected[:, 0] += (fe[:, i, j] * fe[:, j, i]).sum(-1)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["sum", "mean", "max"])
def test_sequence_pooling(rng, mode):
    B, T, K = 4, 6, 3
    e = rng.normal(size=(B, T, K)).astype(np.float32)
    lengths = np.array([1, 3, 6, 0], np.int32)
    mask = np.asarray(length_mask(jnp.asarray(lengths), T))
    out = np.asarray(sequence_pooling(jnp.asarray(e), jnp.asarray(mask), mode))
    for b in range(B):
        L = lengths[b]
        if mode == "max":
            if L > 0:
                np.testing.assert_allclose(out[b], e[b, :L].max(0), rtol=1e-5)
        elif mode == "sum":
            np.testing.assert_allclose(out[b], e[b, :L].sum(0), rtol=1e-4,
                                       atol=1e-5)
        else:
            expected = e[b, :L].sum(0) / (L + 1e-8)
            np.testing.assert_allclose(out[b], expected, rtol=1e-4, atol=1e-5)


def test_weighted_sequence_softmax_normalization(rng):
    B, T, K = 2, 5, 3
    e = np.ones((B, T, K), np.float32)
    w = rng.normal(size=(B, T)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
    out = np.asarray(weighted_sequence(jnp.asarray(e), jnp.asarray(w),
                                       jnp.asarray(mask), normalize=True))
    # softmax over valid steps -> weighted (all-ones) rows sum to 1 over time
    sums = out.sum(axis=(1,))[:, 0]
    np.testing.assert_allclose(sums, np.ones(B), rtol=1e-5)
    assert np.all(out[0, 3:] < 1e-6)  # masked steps ~0


def test_masked_softmax_zeroes_invalid():
    scores = jnp.asarray([[1.0, 2.0, 3.0]])
    mask = jnp.asarray([[True, True, False]])
    p = np.asarray(masked_softmax(scores, mask))
    assert p[0, 2] < 1e-6
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)


def test_din_attention_concat_folding_exact():
    """The folded first layer must equal the naive tile+concat MLP exactly
    (it is the same linear map): guards ops/pallas_kernels.py din_attention_ref."""
    import jax
    import jax.numpy as jnp
    from recommender_system_tpu.ops.pallas_kernels import din_attention_ref

    rng = np.random.default_rng(3)
    B, T, K, h1, h2 = 16, 10, 8, 20, 12
    query = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    keys = jnp.asarray(rng.standard_normal((B, T, K)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, T)) > 0.3)
    w1 = jnp.asarray(rng.standard_normal((4 * K, h1)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(h1) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h1, h2)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(h2) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((h2, 1)) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal(1) * 0.1, jnp.float32)

    got = din_attention_ref(query, keys, mask, w1, b1, w2, b2, w3, b3)

    q = jnp.broadcast_to(query[:, None, :], keys.shape)
    att_in = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)
    h = jax.nn.sigmoid(att_in @ w1 + b1)
    h = jax.nn.sigmoid(h @ w2 + b2)
    score = (h @ w3 + b3)[..., 0]
    score = jax.nn.softmax(jnp.where(mask, score, -2.0 ** 31), axis=-1)
    want = jnp.einsum("bt,btk->bk", score, keys)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_din_attention_bf16_scorer_parity():
    """dtype=bfloat16 must (a) still return f32 outputs (softmax/pooling stay
    f32) and (b) track the f32 reference within bf16 tolerance, for both
    return_score modes and the DIEN AuxiliaryNet logits (ADVICE r2)."""
    import jax
    import jax.numpy as jnp
    from recommender_system_tpu.layers.sequence import DinAttention
    from recommender_system_tpu.models.dien import AuxiliaryNet

    rng = np.random.default_rng(7)
    B, T, K = 8, 12, 16
    q = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    keys = jnp.asarray(rng.standard_normal((B, T, K)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, T)) > 0.3)
    mask = mask.at[:, 0].set(True)  # no empty rows

    for return_score in (False, True):
        ref_mod = DinAttention(hidden_units=(16, 8), use_pallas=False,
                               return_score=return_score)
        variables = ref_mod.init(jax.random.PRNGKey(0), q, keys, mask)
        ref = ref_mod.apply(variables, q, keys, mask)
        bf_mod = DinAttention(hidden_units=(16, 8), use_pallas=False,
                              return_score=return_score, dtype=jnp.bfloat16)
        got = bf_mod.apply(variables, q, keys, mask)
        assert got.dtype == jnp.float32, (return_score, got.dtype)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0.05, atol=0.02)

    H = 16
    states = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
    items = jnp.asarray(rng.standard_normal((B, T, K)), jnp.float32)
    ref_net = AuxiliaryNet()
    variables = ref_net.init(jax.random.PRNGKey(1), states, items)
    ref = ref_net.apply(variables, states, items)
    got = AuxiliaryNet(dtype=jnp.bfloat16).apply(variables, states, items)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_din_attention_remat_vjp_matches_autodiff():
    """The hand-written backward (ops/din_vjp.din_attention_remat) must match
    autodiff of din_attention_ref in f32 for every (activation,
    weight_normalization, return_scores) combination, including a fully
    masked row (VERDICT r4 #1)."""
    import jax
    from recommender_system_tpu.ops.din_vjp import din_attention_remat
    from recommender_system_tpu.ops.pallas_kernels import din_attention_ref

    rng = np.random.default_rng(11)
    B, T, K, h1, h2 = 6, 9, 8, 10, 5
    query = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    keys = jnp.asarray(rng.standard_normal((B, T, K)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, T)) > 0.3)
    mask = mask.at[0].set(False)  # one fully-masked row
    w1 = jnp.asarray(rng.standard_normal((4 * K, h1)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(h1) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h1, h2)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(h2) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((h2, 1)) * 0.2, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal(1) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    cotk = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)

    for act in ("sigmoid", "relu"):
        for wn in (True, False):
            for rs in (True, False):
                g = cot if rs else cotk

                def loss_ref(q, k, *ps):
                    out = din_attention_ref(q, k, mask, *ps, act, wn, rs)
                    return jnp.sum(out * g)

                def loss_got(q, k, *ps):
                    out = din_attention_remat(q, k, mask, *ps, act, wn, rs,
                                              None)
                    return jnp.sum(out * g)

                args = (query, keys, w1, b1, w2, b2, w3, b3)
                want_out = loss_ref(*args)
                got_out = loss_got(*args)
                np.testing.assert_allclose(np.asarray(got_out),
                                           np.asarray(want_out),
                                           rtol=1e-5, atol=1e-6)
                want = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
                got = jax.grad(loss_got, argnums=tuple(range(8)))(*args)
                for a, b in zip(got, want):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
                        err_msg=f"act={act} wn={wn} rs={rs}")


def test_din_attention_remat_bf16_grads_track_f32():
    """bf16 remat grads must stay f32-dtyped and close to the f32 grads."""
    import jax
    from recommender_system_tpu.ops.din_vjp import din_attention_remat

    rng = np.random.default_rng(13)
    B, T, K, h1, h2 = 4, 7, 8, 6, 4
    query = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    keys = jnp.asarray(rng.standard_normal((B, T, K)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, T)) > 0.3).at[:, 0].set(True)
    w1 = jnp.asarray(rng.standard_normal((4 * K, h1)) * 0.2, jnp.float32)
    b1 = jnp.zeros((h1,))
    w2 = jnp.asarray(rng.standard_normal((h1, h2)) * 0.2, jnp.float32)
    b2 = jnp.zeros((h2,))
    w3 = jnp.asarray(rng.standard_normal((h2, 1)) * 0.2, jnp.float32)
    b3 = jnp.zeros((1,))

    def loss(dt, q, k, *ps):
        return jnp.sum(din_attention_remat(q, k, mask, *ps,
                                           "sigmoid", True, False, dt))

    args = (query, keys, w1, b1, w2, b2, w3, b3)
    g32 = jax.grad(lambda *a: loss(None, *a), argnums=tuple(range(8)))(*args)
    g16 = jax.grad(lambda *a: loss("bfloat16", *a),
                   argnums=tuple(range(8)))(*args)
    for a, b in zip(g16, g32):
        assert a.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.1, atol=0.05)
