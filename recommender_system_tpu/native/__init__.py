"""Native (C++) components: build-on-first-use via g++, loaded through ctypes.

The reference has no native code (SURVEY.md: 100% Python/TF). Here the
host-side data path — the one part of the stack that is neither XLA compute
nor trivially vectorizable in numpy — is C++: a multithreaded Criteo TSV
parser with FNV-1a categorical hashing (bit-identical to
``utils.hashing.hash_strings_np``), ~an order of magnitude faster than the
pandas + python-loop pipeline.

No pybind11 in this image, so the library exposes a plain C ABI consumed via
ctypes; the .so is compiled once into ``~/.cache/recommender_system_tpu``.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "criteo_parser.cpp")
_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "recommender_system_tpu")

_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the parser; returns the .so path or None (error recorded)."""
    global _build_error
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        os.makedirs(_CACHE_DIR, exist_ok=True)
        so_path = os.path.join(_CACHE_DIR, f"criteo_parser_{digest}.so")
        if os.path.exists(so_path):
            return so_path
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               "-pthread", _SRC, "-o", so_path + ".tmp"]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            _build_error = proc.stderr[-2000:]
            return None
        os.replace(so_path + ".tmp", so_path)
        return so_path
    except Exception as e:  # g++ missing, read-only fs, ...
        _build_error = repr(e)
        return None


def get_lib():
    """ctypes handle to the native library, or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    so_path = _build()
    if so_path is None:
        return None
    lib = ctypes.CDLL(so_path)
    lib.criteo_count_rows.argtypes = [ctypes.c_char_p]
    lib.criteo_count_rows.restype = ctypes.c_int64
    lib.criteo_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.criteo_parse.restype = ctypes.c_int64
    lib.criteo_parse_chunk.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.criteo_parse_chunk.restype = ctypes.c_int64
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def build_error() -> Optional[str]:
    return _build_error


def parse_criteo_native(
    path: str, max_rows: Optional[int] = None, threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse a Criteo TSV -> (labels f32 [N], dense f32 [N,13],
    sparse_hashes u64 [N,26]; 0 = missing token)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native parser unavailable: {_build_error}")
    if threads <= 0:
        threads = min(os.cpu_count() or 1, 16)
    total = lib.criteo_count_rows(path.encode())
    if total < 0:
        raise FileNotFoundError(path)
    n = int(total if max_rows is None else min(total, max_rows))
    labels = np.zeros(n, np.float32)
    dense = np.zeros((n, 13), np.float32)
    sparse = np.zeros((n, 26), np.uint64)
    rows = lib.criteo_parse(
        path.encode(), n, threads,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sparse.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    if rows < 0:
        raise IOError(f"native parse failed for {path}")
    return labels[:rows], dense[:rows], sparse[:rows]


def iter_criteo_chunks(path: str, chunk_rows: int, threads: int = 0):
    """Stream a Criteo TSV in bounded-memory chunks (out-of-core path).

    Yields ``(labels f32 [n], dense f32 [n,13], sparse u64 [n,26])`` with
    ``n <= chunk_rows``; only one chunk (plus the parser's read window) is
    resident at a time, so arbitrarily large files train with bounded RSS.
    Extends the reference's whole-file ``pd.read_csv``
    (``utils/dataset.py:36-75``) to beyond-RAM datasets.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native parser unavailable: {_build_error}")
    if threads <= 0:
        threads = min(os.cpu_count() or 1, 16)
    offset = ctypes.c_int64(0)
    while True:
        labels = np.zeros(chunk_rows, np.float32)
        dense = np.zeros((chunk_rows, 13), np.float32)
        sparse = np.zeros((chunk_rows, 26), np.uint64)
        rows = lib.criteo_parse_chunk(
            path.encode(), ctypes.byref(offset), chunk_rows, threads,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            sparse.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        if rows < 0:
            raise IOError(f"native chunk parse failed for {path} "
                          f"at offset {offset.value}")
        if rows == 0:
            return
        yield labels[:rows], dense[:rows], sparse[:rows]
