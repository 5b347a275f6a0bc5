"""Native C++ Criteo parser: build, parse, hash parity with the python path."""
import os

import numpy as np
import pytest

from recommender_system_tpu import native
from recommender_system_tpu.utils.datasets import REFERENCE_DATA_DIR, load_criteo
from recommender_system_tpu.utils.hashing import hash_strings_np

pytestmark = pytest.mark.skipif(not native.available(),
                                reason=f"native build failed: "
                                       f"{native.build_error()}")


@pytest.fixture()
def tsv(tmp_path):
    # label, 13 dense (some missing), 26 categoricals (some missing)
    rows = [
        "1\t" + "\t".join(str(i) for i in range(1, 14)) + "\t"
        + "\t".join(f"tok{i}" for i in range(26)),
        "0\t" + "\t".join([""] * 13) + "\t" + "\t".join([""] * 26),
        "1\t0.5\t" + "\t".join([""] * 12) + "\ta\t" + "\t".join([""] * 25),
    ]
    p = tmp_path / "mini.txt"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_parse_minimal(tsv):
    labels, dense, hashes = native.parse_criteo_native(tsv)
    np.testing.assert_array_equal(labels, [1, 0, 1])
    assert dense.shape == (3, 13) and hashes.shape == (3, 26)
    np.testing.assert_allclose(dense[0], np.arange(1, 14))
    np.testing.assert_allclose(dense[1], 0.0)  # missing -> 0
    assert np.all(hashes[1] == 0)              # missing -> sentinel 0
    # FNV parity with the python hasher (raw 64-bit value check via bucketing)
    py = hash_strings_np([f"tok{i}" for i in range(26)], 1000, mask_zero=True)
    nat = np.where(hashes[0] == 0, 0,
                   (hashes[0] % np.uint64(999) + np.uint64(1)).astype(np.int64))
    np.testing.assert_array_equal(py, nat)


def test_max_rows(tsv):
    labels, dense, hashes = native.parse_criteo_native(tsv, max_rows=2)
    assert len(labels) == 2


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE_DATA_DIR, "criteo",
                                    "train_1w.txt")),
    reason="criteo sample not mounted")
def test_native_loader_matches_pandas_loader():
    kw = dict(hash_buckets=5000, max_rows=1500, embedding_dim=4)
    cols_n, Xn, yn, Xtn, ytn = load_criteo(engine="native", **kw)
    cols_p, Xp, yp, Xtp, ytp = load_criteo(engine="pandas", **kw)
    np.testing.assert_array_equal(yn, yp)
    for c in Xn:
        np.testing.assert_allclose(Xn[c], Xp[c], rtol=1e-5,
                                   err_msg=f"column {c}")
