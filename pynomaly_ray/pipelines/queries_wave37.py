"""Wave-37: int8 embedding quantization with an exact integer surface.

``embedding_quantize`` — the vector-compression step an ANN index takes
before a 100-TB corpus fits in serving memory (scalar quantization, the
IVF-SQ8 shape): per-dimension global (min, max) bounds reduced from
O(64 x blocks) partial rows, then each coordinate maps to an 8-bit code
``(e6 - mn) * 255 // (mx - mn + 1)`` — all-integer on the e6 grid, so
the engine and the DuckDB twin compute byte-identical codes (numerator
is non-negative, so DuckDB's truncating ``//`` equals floor).  The
query certifies codes through two per-vector checksums: the code sum
and the dimension-weighted code sum (order-sensitive, so a permuted
code vector cannot hash equal).

Scale shape: pass 1 is the embedding_dim_profile exchange (64 rows per
block, corpus-size-independent); the bounds broadcast in a task
closure (64 ints); pass 2 is map-side only — codes never shuffle, and
a real deployment would write them straight to parquet alongside the
doc id.  The collect here exists only for the oracle harness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted, hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq


def _dim_bounds(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension global (min_e6, max_e6) — the broadcast surface."""
    from pynomaly_ray.stages.similarity import _embedding_matrix

    ds = _pq(sf_dir, "embeddings", ["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch)
        if m.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "mn": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        e6 = np.floor(m * 1_000_000.0 + 0.5).astype(np.int64)
        d = e6.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "mn": pa.array(e6.min(axis=0)),
                "mx": pa.array(e6.max(axis=0)),
            }
        )

    out = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["dim"],
        lambda df: df.groupby("dim", sort=False)
        .agg(mn=("mn", "min"), mx=("mx", "max"))
        .reset_index(),
    ).to_pandas()
    out = out.sort_values("dim", kind="mergesort").reset_index(drop=True)
    return (
        out["mn"].to_numpy(np.int64),
        out["mx"].to_numpy(np.int64),
    )


def quantize_codes(e6: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """e6-grid coordinates -> uint8 codes, all-integer: floor-scaled
    into [0, 255] within each dimension's global [mn, mx] span (a
    degenerate dimension — mx == mn — codes to 0)."""
    return (e6 - mn[None, :]) * 255 // (mx[None, :] - mn[None, :] + 1)


def q_embedding_quantize(sf_dir: str):
    from pynomaly_ray.stages.similarity import _embedding_matrix

    mn, mx = _dim_bounds(sf_dir)
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])

    def codes(batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch)
        if m.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "qsum": pa.array([], pa.int64()),
                    "qdot": pa.array([], pa.int64()),
                }
            )
        e6 = np.floor(m * 1_000_000.0 + 0.5).astype(np.int64)
        q = quantize_codes(e6, mn, mx)
        dims = np.arange(1, q.shape[1] + 1, dtype=np.int64)
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "qsum": pa.array(q.sum(axis=1)),
                "qdot": pa.array((q * dims[None, :]).sum(axis=1)),
            }
        )

    out = ds.map_batches(codes, batch_format="pyarrow", batch_size=65536)
    return collect_sorted(out, ["vec_id"])


SQL_EMBEDDING_QUANTIZE = """
WITH e AS (
  SELECT vec_id, t.i AS dim,
         CAST(FLOOR(CAST(embedding[t.i] AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS e6
  FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
),
b AS (SELECT dim, MIN(e6) AS mn, MAX(e6) AS mx FROM e GROUP BY dim),
q AS (
  SELECT e.vec_id, e.dim,
         ((e.e6 - b.mn) * 255) // (b.mx - b.mn + 1) AS code
  FROM e JOIN b ON e.dim = b.dim
)
SELECT vec_id,
       CAST(SUM(code) AS BIGINT) AS qsum,
       CAST(SUM(code * dim) AS BIGINT) AS qdot
FROM q
GROUP BY vec_id
ORDER BY vec_id
"""


ORACLE_QUERIES["embedding_quantize"] = (
    q_embedding_quantize,
    SQL_EMBEDDING_QUANTIZE,
)
