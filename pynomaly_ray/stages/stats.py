"""Per-partition column statistics: mergeable partials + final stat vectors.

The engine analogue of the reference's "observation matrix" construction:
each Parquet partition becomes ONE row of a small stat table (SURVEY.md
§1.2), which is what LoOP is fit on.  Partials are computed per batch
inside the stage-A scan (pure vector-adds: counts, moment sums, token-id
histogram, exact sequence-length histogram) and merged with a tiny
``groupby(partition_id)`` shuffle — the classic partial+final aggregation
(SURVEY.md §2.5 A6), so hot partitions never hot-spot a reducer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pynomaly_ray.config import (
    MAX_TRACKED_LEN,
    N_TOKEN_BUCKETS,
    PARTIAL_STATS_SCHEMA,
)

N_LEN_BUCKETS = MAX_TRACKED_LEN // 16


def partial_stats_batch(
    batch: pa.Table, valid_mask: np.ndarray, vocab_size: int
) -> pa.Table:
    """One partial-stats row per partition present in this batch.

    All accumulators are order-insensitive (sums / histogram adds) so the
    later merge is deterministic regardless of task scheduling — required
    for the identical-manifest resume guarantee (north_rule).
    """
    if not valid_mask.any():
        return PARTIAL_STATS_SCHEMA.empty_table()

    # the all-valid batch is the common case: skip the (token-payload
    # copying) filter entirely
    sub = batch if valid_mask.all() else batch.filter(pa.array(valid_mask))
    # null partition_id rows must not raise: bucket them under the same
    # sentinel the violation rows use.  Arrow dictionary_encode, not
    # pd.factorize / np.unique-on-object: pandas' object hash table
    # compares strings as C strings (partition ids differing only after
    # an embedded NUL byte silently merge into one stats group) and
    # np.unique on object arrays is an O(n log n) Python-compare sort —
    # ~60x slower than the length-prefixed Arrow C++ hash table, which
    # is both NUL-safe and faster than either pandas path.
    part_col = sub["partition_id"]
    if isinstance(part_col, pa.ChunkedArray):
        part_col = part_col.combine_chunks()
    enc = pc.dictionary_encode(pc.fill_null(part_col, "<null>"))
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    source = sub["source"].to_pandas().to_numpy(dtype=object)
    n_parts = len(uniques)

    tokens = sub["tokens"]
    comb = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    offsets = comb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = comb.values[offsets[0] : offsets[-1]].to_numpy(zero_copy_only=False)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)

    lf = lengths.astype(np.float64)
    n_rows = np.bincount(codes, minlength=n_parts).astype(np.int64)
    s1 = np.bincount(codes, weights=lf, minlength=n_parts)
    s2 = np.bincount(codes, weights=lf * lf, minlength=n_parts)
    s3 = np.bincount(codes, weights=lf * lf * lf, minlength=n_parts)

    # Token-id histogram: coarse bucket per token.  When the vocab is a
    # multiple of the bucket count, `tok * B // vocab == tok // (vocab//B)`
    # exactly, computable in int32 without the x2.4M-element int64 temp.
    if vocab_size >= N_TOKEN_BUCKETS and vocab_size % N_TOKEN_BUCKETS == 0:
        tok_bucket = np.minimum(
            flat // np.int32(vocab_size // N_TOKEN_BUCKETS),
            N_TOKEN_BUCKETS - 1,
        )
    else:
        tok_bucket = (
            flat.astype(np.int64) * N_TOKEN_BUCKETS // max(vocab_size, 1)
        ).clip(0, N_TOKEN_BUCKETS - 1)
    if n_parts == 1:
        # single partition per batch (the normal layout: one file per
        # partition) -> no per-token partition codes needed at all
        tok_hist = np.bincount(
            tok_bucket, minlength=N_TOKEN_BUCKETS
        ).reshape(1, N_TOKEN_BUCKETS)
    else:
        tok_codes = np.repeat(codes, lengths)
        tok_hist = np.bincount(
            tok_codes * N_TOKEN_BUCKETS + tok_bucket,
            minlength=n_parts * N_TOKEN_BUCKETS,
        ).reshape(n_parts, N_TOKEN_BUCKETS)

    # Exact sequence-length histogram (bucket width 16, cap MAX_TRACKED_LEN):
    # fully mergeable, exact quantiles at finalize time.
    len_bucket = np.minimum(lengths, MAX_TRACKED_LEN - 1) // 16
    len_hist = np.bincount(
        codes * N_LEN_BUCKETS + len_bucket, minlength=n_parts * N_LEN_BUCKETS
    ).reshape(n_parts, N_LEN_BUCKETS)

    # first source value seen per partition (constant within a partition)
    first_idx = np.full(n_parts, -1, dtype=np.int64)
    uniq_codes, first_pos = np.unique(codes, return_index=True)
    first_idx[uniq_codes] = first_pos
    src_vals = source[first_idx]

    return pa.table(
        {
            "partition_id": pa.array(list(uniques), pa.string()),
            "source": pa.array(list(src_vals), pa.string()),
            "n_rows": pa.array(n_rows, pa.int64()),
            "n_tok_sum": pa.array(s1, pa.float64()),
            "n_tok_sum2": pa.array(s2, pa.float64()),
            "n_tok_sum3": pa.array(s3, pa.float64()),
            "tok_hist": pa.array(list(tok_hist), pa.list_(pa.int64())),
            "len_hist": pa.array(list(len_hist), pa.list_(pa.int64())),
        },
        schema=PARTIAL_STATS_SCHEMA,
    )


def merge_partials_df(df: pd.DataFrame) -> pd.DataFrame:
    """Bucket-level reducer for ``hash_aggregate``: merge ALL partitions'
    partial rows present in one hash bucket (vectorized sums; the
    histogram vector-adds run once per partition, not per row)."""
    from pynomaly_ray.functions.hashing import nul_safe_key

    def _vsum(s: pd.Series) -> np.ndarray:
        return np.sum(np.stack([np.asarray(v) for v in s.to_numpy()]), axis=0)

    # nul_safe_key: partials are few (partitions x batches), so the
    # Arrow-string cast is cheap here — and partition ids differing only
    # after an embedded NUL must not merge in the final reduction either
    df = df.assign(partition_id=nul_safe_key(df["partition_id"]))
    g = df.groupby("partition_id", sort=False)
    out = g.agg(
        source=("source", "first"),
        n_rows=("n_rows", "sum"),
        n_tok_sum=("n_tok_sum", "sum"),
        n_tok_sum2=("n_tok_sum2", "sum"),
        n_tok_sum3=("n_tok_sum3", "sum"),
    )
    out["tok_hist"] = g["tok_hist"].apply(_vsum)
    out["len_hist"] = g["len_hist"].apply(_vsum)
    out = out.reset_index()
    # restore the plain-object key dtype so downstream Arrow conversion
    # yields `string` blocks identical to the pre-merge schema
    out["partition_id"] = out["partition_id"].astype(object)
    return out


def _hist_quantile(hist: np.ndarray, q: float) -> float:
    """Quantile from an exact bucket-count histogram (bucket width 16)."""
    total = hist.sum()
    if total == 0:
        return 0.0
    target = q * total
    cum = np.cumsum(hist)
    b = int(np.searchsorted(cum, target, side="left"))
    return float(b * 16 + 8)  # bucket midpoint


def finalize_stat_vector(row: pd.Series) -> np.ndarray:
    """Merged counters -> the fixed-width float64 stat vector LoOP sees.

    Features: [mean_n_tok, std_n_tok, skew_n_tok, len_p50, len_p90,
    len_p99, tok_hist_frac_0..N-1].  These are the "n_tok moments,
    token-id histograms, per-source sequence-length sketches" of the
    north_star, as per-partition observations.
    """
    n = max(int(row["n_rows"]), 1)
    s1, s2, s3 = row["n_tok_sum"], row["n_tok_sum2"], row["n_tok_sum3"]
    mean = s1 / n
    var = max(s2 / n - mean * mean, 0.0)
    std = np.sqrt(var)
    if std > 0:
        skew = (s3 / n - 3 * mean * var - mean**3) / (std**3)
    else:
        skew = 0.0
    lh = np.asarray(row["len_hist"], dtype=np.float64)
    th = np.asarray(row["tok_hist"], dtype=np.float64)
    tok_frac = th / max(th.sum(), 1.0)
    return np.concatenate(
        [
            [mean, std, skew],
            [_hist_quantile(lh, 0.5), _hist_quantile(lh, 0.9), _hist_quantile(lh, 0.99)],
            tok_frac,
        ]
    )
