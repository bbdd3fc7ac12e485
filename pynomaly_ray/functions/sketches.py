"""Mergeable sketches for approximate wide aggregations.

HyperLogLog here is the engine's approximate-COUNT(DISTINCT) path: the
exact path (q_distinct_users) must ship every distinct (group, key) pair
through the exchange — O(distinct) bytes — while a register vector is a
CONSTANT 2^p bytes per group regardless of cardinality, which is the
difference between a shuffle and a broadcastable partial at 100 TB.

All operations are vectorized over whole key arrays (np.bincount over
register indices); partials merge by element-wise max — associative,
commutative, idempotent, so retries and arbitrary splits are safe.
"""

from __future__ import annotations

import numpy as np

from pynomaly_ray.functions.hashing import hash_strings

_ALPHA16 = 0.673
_ALPHA32 = 0.697
_ALPHA64 = 0.709


def _alpha(m: int) -> float:
    if m == 16:
        return _ALPHA16
    if m == 32:
        return _ALPHA32
    if m == 64:
        return _ALPHA64
    return 0.7213 / (1.0 + 1.079 / m)


def hll_partial(values, p: int = 12) -> np.ndarray:
    """Register vector (uint8, length 2^p) for one batch of keys.

    Vectorized: stable 64-bit key hash -> top p bits pick the register,
    the rank (leading-zero count + 1) of the remaining 64-p bits is
    max-combined into it via np.maximum.at-free bincount trick.
    """
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    h = hash_strings(values)
    if not len(h):
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rank = leading zeros of `rest` + 1, computed via float64 exponent
    # (exact for the leading-bit position; rest is never 0 thanks to the
    # guard bit above)
    exp = ((rest.astype(np.float64)).view(np.uint64) >> np.uint64(52)).astype(
        np.int64
    )
    # 1086 = bias(1023) + 63; clip guards the 2^64-rounding edge where a
    # near-max value rounds up a power of two (true rank is 1 there)
    lz = np.maximum(np.int64(1086) - exp, 0)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(parts) -> np.ndarray:
    """Element-wise max of register vectors (associative/idempotent)."""
    out = None
    for pvec in parts:
        arr = np.asarray(pvec, dtype=np.uint8)
        out = arr.copy() if out is None else np.maximum(out, arr)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction — relative error ~1.04/sqrt(2^p)."""
    regs = np.asarray(regs, dtype=np.float64)
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs))
    if est <= 2.5 * m:
        zeros = np.count_nonzero(regs == 0)
        if zeros:
            return m * np.log(m / zeros)
    return float(est)
