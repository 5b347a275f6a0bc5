"""Deterministic feature hashing (host-side numpy and on-device jax).

The reference hashes string features with ``tf.strings.to_hash_bucket_fast`` inside
the graph (``layer/utils.py:21-65``). On TPU we hash integer ids with a
multiply-xorshift finalizer (splitmix64-style) — vectorized on VPU, no string ops on
device. String hashing happens host-side in the data pipeline (numpy, FNV-1a).

``mask_zero`` parity: when set, id 0 stays 0 (the padding row) and hashed values land
in ``[1, num_buckets)`` — matching ``Hash.call``'s ``num_buckets - 1`` + shift
behavior (``layer/utils.py:48-56``).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def hash_ids(ids, num_buckets: int, mask_zero: bool = False, salt: int = 0):
    """Hash int ids into ``[0, num_buckets)`` (or ``[1, num_buckets)`` if mask_zero).

    Pure jax, runs on VPU. splitmix64 finalizer gives avalanche mixing so
    consecutive ids spread across buckets (important for mod-sharded tables).
    """
    x = jnp.asarray(ids).astype(jnp.uint32)
    orig = x
    x = x ^ jnp.uint32(salt * 0x9E3779B9 + 0x85EBCA6B)
    # 32-bit murmur3 finalizer (device-friendly: uint32 ops only).
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    if mask_zero:
        bucketed = (x % jnp.uint32(num_buckets - 1) + jnp.uint32(1)).astype(jnp.int32)
        return jnp.where(orig == 0, jnp.int32(0), bucketed)
    return (x % jnp.uint32(num_buckets)).astype(jnp.int32)


def hash_strings_np(values, num_buckets: int, mask_zero: bool = False, salt: int = 0) -> np.ndarray:
    """Host-side FNV-1a string/bytes hashing into buckets (numpy, vectorized loop).

    Used by data loaders for raw categorical strings (e.g. Criteo hex tokens),
    replacing the reference's LabelEncoder / in-graph string hash
    (``utils/dataset.py:49-52``, ``layer/utils.py:48``).
    """
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
            h = np.uint64((int(h) ^ b) * int(prime) & 0xFFFFFFFFFFFFFFFF)
        out[i] = int(h % np.uint64(span)) + lo
    return out.astype(np.int64)
