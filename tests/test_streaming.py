"""Out-of-core data path: chunked C++ TSV parsing, the streaming batch
iterator, and Trainer.fit_stream's double-buffered training loop."""
import os

import numpy as np
import pytest

from recommender_system_tpu import native
from recommender_system_tpu.utils.datasets import (REFERENCE_DATA_DIR,
                                                   criteo_columns,
                                                   stream_criteo)

CRITEO = os.path.join(REFERENCE_DATA_DIR, "criteo", "train_1w.txt")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason=f"native parser unavailable: "
                                       f"{native.build_error()}")


def test_chunked_parse_matches_full_parse():
    """Chunk iterator (any chunk size, incl. non-dividing) == one-shot parse."""
    full_l, full_d, full_s = native.parse_criteo_native(CRITEO)
    for chunk_rows in (777, 4096, 20000):
        parts = list(native.iter_criteo_chunks(CRITEO, chunk_rows))
        labels = np.concatenate([p[0] for p in parts])
        dense = np.concatenate([p[1] for p in parts])
        sparse = np.concatenate([p[2] for p in parts])
        assert len(labels) == len(full_l), chunk_rows
        np.testing.assert_array_equal(labels, full_l)
        np.testing.assert_array_equal(dense, full_d)
        np.testing.assert_array_equal(sparse, full_s)
        if chunk_rows < len(full_l):
            assert all(len(p[0]) == chunk_rows for p in parts[:-1])


def test_chunked_parse_synthetic_file(tmp_path):
    """Round-trips a generated TSV incl. missing fields and a no-newline tail."""
    rng = np.random.default_rng(0)
    n = 5000
    lines = []
    for i in range(n):
        dense = "\t".join("" if rng.random() < 0.2 else str(int(x))
                          for x in rng.integers(0, 100, 13))
        sparse = "\t".join("" if rng.random() < 0.2 else f"tok{x:08x}"
                           for x in rng.integers(0, 1 << 20, 26))
        lines.append(f"{i % 2}\t{dense}\t{sparse}")
    path = tmp_path / "synth.txt"
    path.write_text("\n".join(lines))  # note: NO trailing newline
    full = native.parse_criteo_native(str(path))
    assert len(full[0]) == n
    parts = list(native.iter_criteo_chunks(str(path), 1234))
    np.testing.assert_array_equal(np.concatenate([p[0] for p in parts]),
                                  full[0])
    np.testing.assert_array_equal(np.concatenate([p[2] for p in parts]),
                                  full[2])


def test_stream_criteo_batches():
    buckets = 1 << 12
    bs = 512
    seen = 0
    first = None
    for X, y in stream_criteo(CRITEO, batch_size=bs, hash_buckets=buckets,
                              chunk_rows=3000):
        assert y.shape == (bs,)
        assert X["C1"].dtype == np.int32
        assert X["C1"].min() >= 0 and X["C1"].max() <= buckets
        assert X["I1"].shape == (bs, 1)
        assert np.isfinite(X["I1"]).all() and (X["I1"] >= 0).all()
        if first is None:
            first = (X["C5"].copy(), y.copy())
        seen += bs
    assert seen == (10000 // bs) * bs

    # batches replay deterministically and match the one-shot hashed parse
    labels, dense, hashes = native.parse_criteo_native(CRITEO)
    span = np.uint64(buckets - 1)
    want = (hashes[:bs, 4] % span + np.uint64(1)).astype(np.int32)
    want = np.where(hashes[:bs, 4] == 0, 0, want)
    np.testing.assert_array_equal(first[0], want)
    np.testing.assert_array_equal(first[1], labels[:bs])


def test_fit_stream_trains_deepfm():
    import optax

    from recommender_system_tpu.models import DeepFM
    from recommender_system_tpu.training import FusedAdagrad, Trainer

    buckets = 1 << 12
    cols = criteo_columns(embedding_dim=8, hash_buckets=buckets)
    model = DeepFM(tuple(cols), hidden_units=(32, 16))
    tr = Trainer(model, optimizer=optax.adagrad(0.05),
                 fused_embedding=FusedAdagrad(0.05))
    first = next(iter(stream_criteo(CRITEO, batch_size=256,
                                    hash_buckets=buckets)))
    state = tr.init(first[0])
    state, hist = tr.fit_stream(
        state, stream_criteo(CRITEO, batch_size=256, hash_buckets=buckets,
                             chunk_rows=2048, epochs=2))
    assert np.isfinite(hist["loss"][0])
    assert hist["examples_per_sec"][0] > 0
    # second pass from the trained state does better than a fresh one
    fresh = tr.init(first[0])
    _, h_fresh = tr.fit_stream(
        fresh, stream_criteo(CRITEO, batch_size=256, hash_buckets=buckets,
                             epochs=1))
    _, h_more = tr.fit_stream(
        state, stream_criteo(CRITEO, batch_size=256, hash_buckets=buckets,
                             epochs=1))
    assert h_more["loss"][0] < h_fresh["loss"][0]
