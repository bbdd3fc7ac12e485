"""Wave-70: SimHash-banded near-dup join (LOSSLESS at hamming <= 3).

``simhash_neardup`` — completes SimHash from a fingerprint column into
an actual near-dup METHOD: the 63-bit signature splits into 4 bands
(16/16/16/15 bits); by pigeonhole, any pair within hamming distance 3
agrees on at least one whole band, so banded candidate generation is
LOSSLESS for the <=3 threshold — the SimHash analogue of
prefix_jaccard_join's exactness (vs MinHash-LSH's probabilistic
recall).  Engine shape: each doc emits 4 (band, value) keys; candidate
pairs verify the exact XOR popcount INSIDE the band-bucket reducer
(signatures ride the exchange, losers never ship), and a pair-keyed
second exchange dedups pairs that matched in several bands.

Certification (surface-oracle pattern): the per-doc signature parquet
feeds an ALL-PAIRS DuckDB twin (bit_count(xor(a,b)) <= 3 self-join) —
the hash match proves the banding lost nothing and the popcount math
agrees; the signature kernel itself stays pinned by the SimHash
bit-parity pytests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted, hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq

_HAM_MAX = 3
_BANDS = ((0, 16), (16, 16), (32, 16), (48, 15))  # 63 used bits


def _popcount64(x: np.ndarray) -> np.ndarray:
    return (
        np.unpackbits(x.astype(np.int64).view(np.uint64).view(np.uint8))
        .reshape(len(x), 64)
        .sum(axis=1)
        .astype(np.int64)
    )


def q_simhash_neardup(sf_dir: str):
    from pynomaly_ray.pipelines.engine_queries import _surface_dir
    from pynomaly_ray.sources.parquet import read_parquet_clean
    from pynomaly_ray.stages.dedup import SimHasher

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    surf = _surface_dir("simhash_nd")
    docs.map_batches(SimHasher(), batch_format="pandas").map_batches(
        lambda t: t.select(["doc_id", "simhash"]), batch_format="pyarrow"
    ).write_parquet(surf)
    sigs = read_parquet_clean(surf)

    def band_rows(t: pa.Table) -> pa.Table:
        sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(object)
        parts = []
        u = sh.view(np.uint64)
        for j, (off, width) in enumerate(_BANDS):
            val = (
                (u >> np.uint64(off)) & np.uint64((1 << width) - 1)
            ).astype(np.int64)
            parts.append(
                pd.DataFrame(
                    {"band": np.int64(j), "val": val, "doc_id": ids, "sig": sh}
                )
            )
        return _from_pandas(pd.concat(parts, ignore_index=True))

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (_b, _v), g in df.groupby(["band", "val"], sort=False):
            n = len(g)
            if n < 2:
                continue
            g = g.sort_values("doc_id", kind="mergesort")
            ids = g["doc_id"].to_numpy(object)
            sg = g["sig"].to_numpy(np.int64)
            iu, ju = np.triu_indices(n, k=1)
            ham = _popcount64(
                (sg[iu].view(np.uint64) ^ sg[ju].view(np.uint64)).astype(
                    np.int64
                )
            )
            keep = ham <= _HAM_MAX
            if keep.any():
                out.append(
                    pd.DataFrame(
                        {
                            "doc_a": ids[iu[keep]],
                            "doc_b": ids[ju[keep]],
                            "hamming": ham[keep],
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype=object),
                    "doc_b": pd.Series(dtype=object),
                    "hamming": pd.Series(dtype=np.int64),
                }
            )
        return pd.concat(out, ignore_index=True)

    cands = hash_aggregate(
        sigs.map_batches(band_rows, batch_format="pyarrow"),
        ["band", "val"],
        emit_pairs,
    )
    uniq = hash_aggregate(
        cands,
        ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]),
    )
    out = collect_sorted(uniq, ["doc_a", "doc_b"])
    out["hamming"] = out["hamming"].astype(np.int64)
    return out[["doc_a", "doc_b", "hamming"]]


SQL_SIMHASH_NEARDUP = """
WITH s AS (
  SELECT doc_id, simhash
  FROM read_parquet('/tmp/pnr_oracle_surface/simhash_nd/*.parquet')
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b
"""


ORACLE_QUERIES["simhash_neardup"] = (q_simhash_neardup, SQL_SIMHASH_NEARDUP)
