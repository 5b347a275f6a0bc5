"""Data pipeline tests: Criteo loader, behavior sequences, hashing, batching."""
import os

import numpy as np
import pytest

from recommender_system_tpu.utils.datasets import (REFERENCE_DATA_DIR,
                                                   build_behavior_dataset,
                                                   gen_sequence_dataset,
                                                   iter_batches, load_criteo,
                                                   load_movielens_ratings,
                                                   pad_to_batch, rows_to_batch,
                                                   synthetic_criteo)
from recommender_system_tpu.utils.features import (SparseFeat, VarLenSparseFeat,
                                                   get_feature_names)
from recommender_system_tpu.utils.hashing import hash_ids, hash_strings_np

HAS_CRITEO = os.path.exists(
    os.path.join(REFERENCE_DATA_DIR, "criteo", "train_1w.txt"))
HAS_ML100K = os.path.exists(os.path.join(REFERENCE_DATA_DIR, "ml-100k", "u.data"))


@pytest.mark.skipif(not HAS_CRITEO, reason="criteo sample not mounted")
def test_load_criteo_label_encoded():
    cols, Xtr, ytr, Xte, yte = load_criteo(max_rows=2000)
    assert len(cols) == 39
    assert len(ytr) + len(yte) == 2000
    sparse = [c for c in cols if isinstance(c, SparseFeat)]
    assert len(sparse) == 26
    for c in sparse:
        assert Xtr[c.name].max() < c.vocabulary_size
        assert Xtr[c.name].min() >= 0
    # dense scaled to [0, 1]
    assert Xtr["I1"].min() >= 0 and Xtr["I1"].max() <= 1.0


@pytest.mark.skipif(not HAS_CRITEO, reason="criteo sample not mounted")
def test_load_criteo_hashed():
    cols, Xtr, _, _, _ = load_criteo(max_rows=500, hash_buckets=1000)
    sparse = [c for c in cols if isinstance(c, SparseFeat)]
    assert all(c.vocabulary_size == 1000 for c in sparse)
    assert all(Xtr[c.name].max() < 1000 for c in sparse)


@pytest.mark.skipif(not HAS_ML100K, reason="ml-100k not mounted")
def test_behavior_dataset():
    cols, Xtr, ytr, Xte, yte = build_behavior_dataset(seq_len=10)
    assert set(Xtr) == {"user_id", "item_id", "hist_item_id", "hist_len"}
    assert Xtr["hist_item_id"].shape[1] == 10
    assert set(np.unique(ytr)) <= {0.0, 1.0}
    varlen = [c for c in cols if isinstance(c, VarLenSparseFeat)]
    assert varlen[0].sparsefeat.embedding_name == "item_id"


@pytest.mark.skipif(not HAS_ML100K, reason="ml-100k not mounted")
def test_gen_sequence_dataset_prefix_expansion():
    ratings = load_movielens_ratings().head(5000)
    train, test = gen_sequence_dataset(ratings, seq_max_len=8)
    assert len(train) > 0 and len(test) > 0
    X, y = rows_to_batch(train[:100], 8)
    assert X["hist_item_id"].shape == (100, 8)
    # most-recent-first histories: first slot is always a real item
    nonzero = X["hist_item_id"][:, 0] != 0
    assert nonzero.all()


def test_hash_ids_properties():
    ids = np.arange(1000, dtype=np.int32)
    h = np.asarray(hash_ids(ids, 64, mask_zero=True))
    assert h[0] == 0  # padding preserved
    assert h[1:].min() >= 1 and h.max() < 64
    # roughly uniform occupancy
    counts = np.bincount(h[1:], minlength=64)[1:]
    assert counts.max() < 4 * counts.mean()


def test_hash_strings_deterministic():
    vals = ["a", "b", "a", "", None]
    h1 = hash_strings_np(vals, 100, mask_zero=True)
    h2 = hash_strings_np(vals, 100, mask_zero=True)
    np.testing.assert_array_equal(h1, h2)
    assert h1[0] == h1[2]
    assert h1[3] == 0 and h1[4] == 0


def test_iter_batches_fixed_shapes():
    cols, X, y = synthetic_criteo(n_rows=100)
    shapes = {tuple(xb["C1"].shape) for xb, _ in iter_batches(X, y, 32)}
    assert shapes == {(32,)}  # drop_remainder keeps shapes static


def test_pad_to_batch_mask():
    cols, X, y = synthetic_criteo(n_rows=70)
    Xp, yp, valid = pad_to_batch(X, y, 32)
    assert len(yp) == 96 and valid.sum() == 70


def test_feature_names_include_aux():
    cols = [VarLenSparseFeat(SparseFeat("h", 10, 4), maxlen=3,
                             length_name="h_len", weight_name="h_w")]
    assert get_feature_names(cols) == ["h", "h_w", "h_len"]


def test_vocab_file_encoding(tmp_path):
    from recommender_system_tpu.utils.vocab import (encode_batch,
                                                    encode_feature,
                                                    encode_with_vocab,
                                                    load_vocab_file)

    p = tmp_path / "vocab.csv"
    p.write_text("apple,1\nbanana,2\ncherry,3\n")
    vocab = load_vocab_file(str(p))
    assert vocab == {"apple": 1, "banana": 2, "cherry": 3}
    ids = encode_with_vocab(["banana", "unknown", None, "apple"], vocab)
    np.testing.assert_array_equal(ids, [2, 0, 0, 1])

    fc = SparseFeat("fruit", 10, 4, vocabulary_path=str(p))
    np.testing.assert_array_equal(
        encode_feature(fc, ["cherry", "nope"]), [3, 0])

    # generators are accepted
    np.testing.assert_array_equal(
        encode_with_vocab((t for t in ["apple", "x"]), vocab), [1, 0])

    # varlen wrapper reaches through to the inner vocabulary_path (2-D values)
    vfc = VarLenSparseFeat(SparseFeat("hist", 10, 4,
                                      vocabulary_path=str(p)), maxlen=2)
    np.testing.assert_array_equal(
        encode_feature(vfc, [["apple", "cherry"], ["nope", "banana"]]),
        [[1, 3], [0, 2]])

    # batch helper: vocab for sparse, float pass-through for dense
    from recommender_system_tpu.utils.features import DenseFeat
    batch = encode_batch([fc, DenseFeat("d", 1)],
                         {"fruit": ["apple"], "d": [[0.5]]})
    np.testing.assert_array_equal(batch["fruit"], [1])
    assert batch["d"].dtype == np.float32


def test_vocab_file_validation(tmp_path):
    from recommender_system_tpu.utils.vocab import (encode_feature,
                                                    load_vocab_file)

    bad = tmp_path / "bad.csv"
    bad.write_text("apple,1\nbroken-line\n")
    with pytest.raises(ValueError, match="bad.csv:2"):
        load_vocab_file(str(bad))

    big = tmp_path / "big.csv"
    big.write_text("rare,10\n")
    fc = SparseFeat("f", 10, 4, vocabulary_path=str(big))
    with pytest.raises(ValueError, match="vocabulary_size"):
        encode_feature(fc, ["rare"])


def test_vocab_precedence_over_hash(tmp_path):
    """vocabulary_path + use_hash: the explicit mapping wins; ids are NOT
    re-hashed on device (reference Hash semantics, layer/utils.py:48-64)."""
    import jax
    from recommender_system_tpu.layers.embedding import (EmbeddingCollection,
                                                         unpack_stack)

    p = tmp_path / "v.csv"
    p.write_text("a,1\nb,2\n")
    fc = SparseFeat("f", 16, 4, use_hash=True, vocabulary_path=str(p))
    batch = {"f": np.array([1, 2], np.int32)}  # already vocab-encoded
    mod = EmbeddingCollection((fc,))
    variables = mod.init(jax.random.PRNGKey(0), batch)
    out = mod.apply(variables, batch)
    table = np.asarray(unpack_stack(variables["params"]["table_d4"], 16, 4))
    np.testing.assert_allclose(np.asarray(out.sparse["f"]), table[[1, 2]],
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# Avazu + Amazon loaders (BASELINE.json configs 3-4 datasets)
# ---------------------------------------------------------------------------

def _write_avazu_fixture(path, n=60):
    from recommender_system_tpu.utils.datasets import AVAZU_SPARSE
    rng = np.random.default_rng(0)
    header = "id,click,hour," + ",".join(AVAZU_SPARSE)
    lines = [header]
    for i in range(n):
        hour = f"1410{21 + i % 7:02d}{i % 24:02d}"
        vals = [f"v{rng.integers(0, 9)}_{c}" for c in AVAZU_SPARSE]
        lines.append(f"{i},{i % 2},{hour}," + ",".join(vals))
    path.write_text("\n".join(lines) + "\n")


def test_load_avazu(tmp_path):
    from recommender_system_tpu.utils.datasets import AVAZU_SPARSE, load_avazu

    p = tmp_path / "avazu.csv"
    _write_avazu_fixture(p)
    cols, Xtr, ytr, Xte, yte = load_avazu(str(p), hash_buckets=128)
    assert len(cols) == len(AVAZU_SPARSE) + 2  # + hour_of_day, day_of_week
    assert len(ytr) + len(yte) == 60 and len(yte) == 12
    names = [c.name for c in cols]
    assert "hour_of_day" in names and "day_of_week" in names
    assert Xtr["hour_of_day"].min() >= 1 and Xtr["hour_of_day"].max() <= 24
    assert Xtr["day_of_week"].min() >= 1 and Xtr["day_of_week"].max() <= 7
    for c in AVAZU_SPARSE:
        assert Xtr[c].min() >= 1 and Xtr[c].max() < 128
    # deterministic reload
    cols2, Xtr2, _, _, _ = load_avazu(str(p), hash_buckets=128)
    np.testing.assert_array_equal(Xtr["site_id"], Xtr2["site_id"])


def test_avazu_trains_deepfm(tmp_path):
    import jax
    import optax
    from recommender_system_tpu.models import DeepFM
    from recommender_system_tpu.training import Trainer
    from recommender_system_tpu.utils.datasets import load_avazu

    p = tmp_path / "avazu.csv"
    _write_avazu_fixture(p)
    cols, Xtr, ytr, _, _ = load_avazu(str(p), hash_buckets=64, embedding_dim=4)
    model = DeepFM(tuple(cols), hidden_units=(16,))
    trainer = Trainer(model, optimizer=optax.adam(1e-2))
    batch = {k: jax.numpy.asarray(v) for k, v in Xtr.items()}
    state = trainer.init(batch)
    state, hist = trainer.fit(state, Xtr, ytr, batch_size=16, epochs=8)
    assert hist["loss"][-1] < hist["loss"][0]


def _write_amazon_fixtures(tmp_path, n_users=12, n_items=15):
    import json
    rng = np.random.default_rng(1)
    reviews = []
    t = 1_300_000_000
    for u in range(n_users):
        for k in range(int(rng.integers(3, 7))):
            t += 100
            reviews.append(json.dumps({
                "reviewerID": f"U{u}", "asin": f"A{rng.integers(0, n_items)}",
                "overall": 5.0, "unixReviewTime": t}))
    rp = tmp_path / "reviews.json"
    rp.write_text("\n".join(reviews) + "\n")
    meta = [json.dumps({"asin": f"A{i}",
                        "categories": [["Electronics", f"cat{i % 4}"]]})
            for i in range(n_items)]
    mp = tmp_path / "meta.json"
    mp.write_text("\n".join(meta) + "\n")
    return rp, mp


def test_amazon_behavior_dataset(tmp_path):
    from recommender_system_tpu.utils.datasets import \
        build_amazon_behavior_dataset

    rp, mp = _write_amazon_fixtures(tmp_path)
    cols, Xtr, ytr, Xte, yte = build_amazon_behavior_dataset(
        str(rp), str(mp), seq_len=8, embedding_dim=4)
    names = [getattr(c, "name", None) for c in cols]
    for want in ("user_id", "item_id", "cate_id",
                 "hist_item_id", "hist_cate_id"):
        assert want in names
    # 1:1 positive/negative pairing
    assert set(np.unique(ytr)) == {0.0, 1.0}
    assert ytr.sum() * 2 == len(ytr)
    assert Xtr["hist_item_id"].shape[1] == 8
    # histories: padding id 0 beyond hist_len, and cate follows item via map
    pos_mask = np.arange(8)[None] < Xtr["hist_len"][:, None]
    assert (Xtr["hist_item_id"][~pos_mask] == 0).all()
    assert (Xtr["hist_cate_id"][Xtr["hist_item_id"] == 0] == 0).all()
    assert (Xtr["hist_cate_id"][Xtr["hist_item_id"] > 0] > 0).all()
    # shared tables: hist features alias the target embedding tables
    varlens = [c for c in cols if isinstance(c, VarLenSparseFeat)]
    assert {v.embedding_name for v in varlens} == {"item_id", "cate_id"}


def test_amazon_neg_hist_and_din(tmp_path):
    import jax
    import optax
    from recommender_system_tpu.models import DIN
    from recommender_system_tpu.training import Trainer
    from recommender_system_tpu.utils.datasets import \
        build_amazon_behavior_dataset

    rp, mp = _write_amazon_fixtures(tmp_path)
    cols, Xtr, ytr, _, _ = build_amazon_behavior_dataset(
        str(rp), str(mp), seq_len=6, embedding_dim=4, negsample_hist=True)
    assert "neg_hist_item_id" in Xtr and "neg_hist_cate_id" in Xtr
    hist, neg = Xtr["hist_item_id"], Xtr["neg_hist_item_id"]
    assert ((neg > 0) == (hist > 0)).all()

    din_cols = tuple(c for c in cols
                     if getattr(c, "name", "").startswith("neg_") is False)
    model = DIN(din_cols, behavior_feature_list=("item_id", "cate_id"))
    trainer = Trainer(model, optimizer=optax.adam(1e-2))
    X = {k: v for k, v in Xtr.items() if not k.startswith("neg_")}
    state = trainer.init({k: jax.numpy.asarray(v[:8]) for k, v in X.items()})
    state, hist = trainer.fit(state, X, ytr, batch_size=16, epochs=6)
    assert hist["loss"][-1] < hist["loss"][0]


def test_synthetic_amazon_reviews_din_learns(tmp_path):
    """The synthetic Amazon fixture (DIN-paper JSON format) flows through
    load_amazon_reviews/build_amazon_behavior_dataset and carries a signal a
    behavior model can learn (users stick to 2 preferred categories)."""
    import optax

    from recommender_system_tpu.models import DIN
    from recommender_system_tpu.training import Trainer
    from recommender_system_tpu.utils.datasets import (
        build_amazon_behavior_dataset, iter_batches, synthetic_amazon_reviews)

    rp, mp = str(tmp_path / "reviews.json"), str(tmp_path / "meta.json")
    n = synthetic_amazon_reviews(rp, mp, n_users=600, n_items=300,
                                 n_cates=10, seed=0)
    assert n > 3000
    cols, Xtr, ytr, Xte, yte = build_amazon_behavior_dataset(
        rp, mp, seq_len=20, embedding_dim=8)
    assert abs(float(ytr.mean()) - 0.5) < 0.01  # 1:1 pos:neg by construction
    model = DIN(tuple(cols), behavior_feature_list=("item_id", "cate_id"),
                hidden_units=(64, 32))
    tr = Trainer(model, optimizer=optax.adam(1e-3))
    state = tr.init(next(iter_batches(Xtr, ytr, 256))[0])
    state, hist = tr.fit(state, Xtr, ytr, batch_size=256, epochs=3)
    metrics = tr.evaluate(state, Xte, yte)
    assert metrics["auc"] > 0.62, metrics


def test_hash_strings_vectorized_exact():
    """The column-wise vectorized FNV-1a must be bit-exact with the
    per-string reference loop (guards the round-5 vectorization; the
    streaming path separately pins these hashes to the C++ parser's)."""
    def ref_loop(values, num_buckets, mask_zero=False, salt=0):
        out = np.empty(len(values), dtype=np.int64)
        lo = 1 if mask_zero else 0
        span = num_buckets - lo
        basis = np.uint64(0xCBF29CE484222325) ^ np.uint64(salt)
        prime = np.uint64(0x100000001B3)
        for i, v in enumerate(values):
            if v is None or v == "" or (isinstance(v, float) and np.isnan(v)):
                out[i] = 0 if mask_zero else int(basis % np.uint64(span)) + lo
                continue
            if not isinstance(v, (bytes, bytearray)):
                v = str(v).encode()
            h = basis
            for b in v:
                h = np.uint64((int(h) ^ b) * int(prime) & (2**64 - 1))
            out[i] = int(h % np.uint64(span)) + lo
        return out

    rng = np.random.default_rng(3)
    vals = ["", None, float("nan"), "a", b"bytes", "0", -17, 3.5,
            "x" * 40] + [f"tok{rng.integers(0, 1 << 30):x}"
                         for _ in range(500)]
    for mask_zero in (False, True):
        for salt in (0, 13):
            np.testing.assert_array_equal(
                hash_strings_np(vals, 4099, mask_zero, salt),
                ref_loop(vals, 4099, mask_zero, salt))


def test_synthetic_avazu_fixture(tmp_path):
    """synthetic_avazu writes a kaggle-schema CSV that load_avazu consumes;
    CTR lands near Avazu's ~0.17 and the category-cross signal is learnable
    (exercised at scale by benchmarks/avazu_parity.py)."""
    from recommender_system_tpu.utils.datasets import (load_avazu,
                                                       synthetic_avazu)

    p = str(tmp_path / "train.csv")
    assert synthetic_avazu(p, n_rows=6000, seed=1) == 6000
    cols, Xtr, ytr, Xte, yte = load_avazu(p, hash_buckets=4096)
    assert len(cols) == 23  # 21 hashed + hour_of_day + day_of_week
    assert len(ytr) + len(yte) == 6000
    assert 0.10 < float(np.mean(ytr)) < 0.25
    assert Xtr["site_id"].max() < 4096
    # deterministic per seed
    p2 = str(tmp_path / "train2.csv")
    synthetic_avazu(p2, n_rows=6000, seed=1)
    assert open(p).read() == open(p2).read()
