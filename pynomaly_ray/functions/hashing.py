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


def digest_floats(arr: np.ndarray) -> str:
    """Short stable hex digest of a float64 vector (for lineage records)."""
    import hashlib

    b = np.ascontiguousarray(arr, dtype=np.float64).tobytes()
    return hashlib.sha256(b).hexdigest()[:16]
