"""Embedding engine tests: fused stacked tables, shared names, hashing, pooling."""
import numpy as np

import jax
import jax.numpy as jnp

from recommender_system_tpu.layers.embedding import (EmbeddingCollection,
                                                     LinearEmbedding,
                                                     build_table_specs,
                                                     unpack_stack)
from recommender_system_tpu.utils.features import (DenseFeat, SparseFeat,
                                                   VarLenSparseFeat)


def _make(cols, batch):
    mod = EmbeddingCollection(tuple(cols))
    variables = mod.init(jax.random.PRNGKey(0), batch)
    return mod, variables


def test_shared_embedding_name_same_vectors():
    """DIEN-style sharing: hist_item_id reuses the item_id table
    (``model/dien.py:180-183``)."""
    cols = [
        SparseFeat("item_id", 50, 8),
        VarLenSparseFeat(SparseFeat("hist_item_id", 50, 8,
                                    embedding_name="item_id"), maxlen=4),
    ]
    batch = {
        "item_id": np.array([3, 7], np.int32),
        "hist_item_id": np.array([[3, 7, 0, 0], [7, 3, 3, 0]], np.int32),
    }
    mod, variables = _make(cols, batch)
    out = mod.apply(variables, batch)
    np.testing.assert_allclose(np.asarray(out.sparse["item_id"][0]),
                               np.asarray(out.varlen_raw["hist_item_id"][0, 0]),
                               rtol=1e-6)
    # only one stacked table of dim 8 exists (lane-packed: 16 rows / 128 lanes)
    assert list(variables["params"].keys()) == ["table_d8"]
    assert np.asarray(
        unpack_stack(variables["params"]["table_d8"], 50, 8)).shape == (50, 8)


def test_stacking_is_equivalent_to_separate_tables():
    cols = [SparseFeat("a", 10, 4), SparseFeat("b", 20, 4)]
    batch = {"a": np.array([1, 2], np.int32), "b": np.array([5, 0], np.int32)}
    mod, variables = _make(cols, batch)
    table = np.asarray(unpack_stack(variables["params"]["table_d4"], 30, 4))
    assert table.shape == (30, 4)
    out = mod.apply(variables, batch)
    np.testing.assert_allclose(np.asarray(out.sparse["a"]), table[[1, 2]],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.sparse["b"]),
                               table[[10 + 5, 10 + 0]], rtol=1e-6)


def test_non_trainable_stops_gradient():
    cols = [SparseFeat("a", 10, 4, trainable=False), SparseFeat("b", 10, 4)]
    batch = {"a": np.array([1], np.int32), "b": np.array([2], np.int32)}
    mod, variables = _make(cols, batch)

    def loss(params):
        out = mod.apply({"params": params}, batch)
        return jnp.sum(out.sparse["a"] ** 2) + jnp.sum(out.sparse["b"] ** 2)

    g = jax.grad(loss)(variables["params"])
    table_grad = np.asarray(unpack_stack(g["table_d4"], 20, 4))
    assert np.all(table_grad[1] == 0)       # 'a' row frozen
    assert np.any(table_grad[10 + 2] != 0)  # 'b' row trains


def test_varlen_pooling_modes():
    for combiner in ["sum", "mean", "max"]:
        cols = [VarLenSparseFeat(SparseFeat("h", 30, 4), maxlen=3,
                                 combiner=combiner)]
        batch = {"h": np.array([[2, 5, 0]], np.int32)}
        mod, variables = _make(cols, batch)
        out = mod.apply(variables, batch)
        table = np.asarray(unpack_stack(variables["params"]["table_d4"], 30, 4))
        valid = table[[2, 5]]
        if combiner == "sum":
            expected = valid.sum(0)
        elif combiner == "mean":
            expected = valid.sum(0) / (2 + 1e-8)
        else:
            expected = valid.max(0)
        np.testing.assert_allclose(np.asarray(out.pooled["h"][0]), expected,
                                   rtol=1e-4, atol=1e-6)


def test_varlen_explicit_length_and_weights():
    cols = [VarLenSparseFeat(SparseFeat("h", 30, 4), maxlen=3, combiner="sum",
                             length_name="h_len", weight_name="h_w",
                             weight_norm=False)]
    batch = {
        "h": np.array([[2, 5, 9]], np.int32),
        "h_len": np.array([2], np.int32),
        "h_w": np.array([[0.5, 2.0, 100.0]], np.float32),
    }
    mod, variables = _make(cols, batch)
    out = mod.apply(variables, batch)
    table = np.asarray(unpack_stack(variables["params"]["table_d4"], 30, 4))
    expected = 0.5 * table[2] + 2.0 * table[5]  # pos 2 masked by length
    np.testing.assert_allclose(np.asarray(out.pooled["h"][0]), expected,
                               rtol=1e-4, atol=1e-5)


def test_hashed_feature_in_range_and_deterministic():
    cols = [SparseFeat("c", 16, 4, use_hash=True)]
    ids = np.array([0, 1, 123456, 99, 1], np.int32)
    batch = {"c": ids}
    mod, variables = _make(cols, batch)
    out1 = mod.apply(variables, batch)
    out2 = mod.apply(variables, batch)
    np.testing.assert_allclose(np.asarray(out1.sparse["c"]),
                               np.asarray(out2.sparse["c"]))
    # id 0 maps to padding row 0
    np.testing.assert_allclose(
        np.asarray(out1.sparse["c"][0]),
        np.asarray(unpack_stack(variables["params"]["table_d4"], 16, 4)[0]),
        rtol=1e-6)
    # same raw id -> same embedding
    np.testing.assert_allclose(np.asarray(out1.sparse["c"][1]),
                               np.asarray(out1.sparse["c"][4]), rtol=1e-6)


def test_dense_transform_fn():
    cols = [DenseFeat("d", 2, transform_fn=lambda x: x * 2.0)]
    batch = {"d": np.array([[1.0, 3.0]], np.float32)}
    mod, variables = _make(cols, batch)
    out = mod.apply(variables, batch)
    np.testing.assert_allclose(np.asarray(out.dense), [[2.0, 6.0]])


def test_linear_embedding_matches_onehot_linear():
    """LinearEmbedding == w . onehot(x) + dense w + b."""
    cols = [SparseFeat("a", 5, 4), DenseFeat("d", 1)]
    batch = {"a": np.array([2, 4], np.int32),
             "d": np.array([[0.5], [1.5]], np.float32)}
    mod = LinearEmbedding(tuple(cols))
    variables = mod.init(jax.random.PRNGKey(0), batch)
    out = np.asarray(mod.apply(variables, batch))
    p = variables["params"]
    table = np.asarray(unpack_stack(p["linear_tables"]["table_d1"], 5, 1))
    dw = np.asarray(p["dense_w"])
    b = np.asarray(p["bias"])
    expected = table[[2, 4]] + np.array([[0.5], [1.5]]) @ dw + b
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
