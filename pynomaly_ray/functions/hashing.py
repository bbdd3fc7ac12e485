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

    ``categorize=False`` is load-bearing: the default categorize path
    factorizes object arrays with a NUL-truncated C-string compare, so
    strings differing only after an embedded ``\\x00`` byte would hash
    identically — and the same string would hash differently depending
    on which other strings share its batch. With ``categorize=False``
    every element is SipHashed over its full UTF-8 bytes, making the
    hash value batch-independent (required for cross-block exchange
    routing and MinHash batch/single parity on hostile crawl text).
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        ser = values.to_pandas()
    elif isinstance(values, pd.Series):
        ser = values
    else:
        ser = pd.Series(values)
    return pd.util.hash_pandas_object(
        ser, index=False, categorize=False
    ).to_numpy()


def nul_safe_key(ser: pd.Series):
    """Groupby/unique-safe view of a key Series.

    pandas routes groupby / factorize / unique on all-``str`` object
    columns through its StringHashTable, which compares values as
    NUL-terminated C strings — keys differing only after an embedded
    ``\\x00`` byte silently alias into one group.  Casting to the
    Arrow-backed string dtype makes pandas hash the full UTF-8 bytes
    instead.  No-op for non-object dtypes (ints, floats, already-Arrow).

    Use this on any group key that can carry hostile crawl text
    (doc_ids, node ids, partition ids); numeric keys pass through free.
    Python-backed ``string`` dtype goes through the same C-string table
    as object, so it is converted too.
    """
    dt = getattr(ser, "dtype", None)
    if dt == object or (
        isinstance(dt, pd.StringDtype) and dt.storage == "python"
    ):
        return ser.astype("string[pyarrow]")
    return ser


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


_M32 = np.uint64(4294967296)
_KNUTH32 = np.uint64(2654435761)  # floor(2^32 / golden ratio)


def knuth32(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Knuth multiplicative hash of integer ids -> int64 in [0, 2^32).

    ``((ids + seed) mod 2^32) * 2654435761 mod 2^32`` — computed in
    uint64 so the product never wraps, making the value bit-identical
    to the SQL twin ``((doc_id + seed) % 4294967296) * 2654435761 %
    4294967296`` at any id magnitude.  The ONE implementation behind
    hash_sample priorities, domain_mix keep decisions, and
    epoch_shuffle keys: the formula must stay in lock-step with
    multiple DuckDB oracle strings, so it lives here exactly once.

    Contract: ids must be NON-NEGATIVE for SQL parity — numpy's uint64
    cast wraps a negative id to 2^64+x while DuckDB's ``%`` keeps the
    sign, so the two sides diverge below zero (corpus ids are unsigned
    by construction; callers hashing arbitrary integers must shift them
    first).
    """
    u = np.asarray(ids).astype(np.uint64)
    return ((((u + np.uint64(seed)) % _M32) * _KNUTH32) % _M32).astype(np.int64)
