"""Wave-38: ANN serving over the quantized codes — the int8 search path.

``knn_sq8`` — completes wave-37's compression story: 4 query vectors
are quantized with the SAME global per-dimension bounds as the corpus,
and top-3 neighbors per query are ranked by the EXACT integer dot
product of the uint8 codes (the asymmetric-distance shortcut an IVF-SQ8
index serves from memory).  Everything after the e6 grid is integer, so
the DuckDB twin reproduces identical dots and the hash match certifies
quantize -> integer GEMM -> per-query top-k end-to-end.

Scale shape: query codes broadcast in the task closure (Q x d ints);
each scan batch does ONE integer matmul and emits only its per-query
top-k rows under the full (dot DESC, cand_id ASC) total order — the
global top-k of top-k partials is exact because every global winner is
a within-batch winner under the same total order.  Driver traffic is
blocks x Q x k rows, corpus-size-independent.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq
from pynomaly_ray.pipelines.queries_wave37 import _dim_bounds, quantize_codes

_N_QUERIES = 4
_TOP_K = 3


def q_knn_sq8(sf_dir: str):
    import pyarrow.parquet as papq

    from pynomaly_ray.stages.similarity import _embedding_matrix

    mn, mx = _dim_bounds(sf_dir)
    qt = papq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", list(range(_N_QUERIES)))],
    )
    q_ids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(q_ids, kind="stable")
    q_ids = q_ids[order]
    qm = _embedding_matrix(qt)[order]
    q_e6 = np.floor(qm * 1_000_000.0 + 0.5).astype(np.int64)
    q_codes = quantize_codes(q_e6, mn, mx)  # (Q, d) broadcast surface

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])

    def topk_partial(batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch)
        if m.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "cand_id": pa.array([], pa.int64()),
                    "dot": pa.array([], pa.int64()),
                }
            )
        e6 = np.floor(m * 1_000_000.0 + 0.5).astype(np.int64)
        codes = quantize_codes(e6, mn, mx)
        dots = codes @ q_codes.T  # (n, Q) exact int64
        cand = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qs, cs, vs = [], [], []
        k = min(_TOP_K, len(cand))
        for j in range(q_codes.shape[0]):
            # within-batch top-k under the FULL (dot DESC, cand ASC)
            # total order, so the global top-k of partials is exact
            sel = np.lexsort((cand, -dots[:, j]))[:k]
            qs.append(np.full(k, q_ids[j], dtype=np.int64))
            cs.append(cand[sel])
            vs.append(dots[sel, j])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qs)),
                "cand_id": pa.array(np.concatenate(cs)),
                "dot": pa.array(np.concatenate(vs)),
            }
        )

    parts = ds.map_batches(
        topk_partial, batch_format="pyarrow", batch_size=8192
    ).to_pandas()
    # driver sees blocks x Q x k rows; final per-query top-k
    parts = parts.sort_values(
        ["query_id", "dot", "cand_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    out = parts.groupby("query_id", sort=True).head(_TOP_K).reset_index(
        drop=True
    )
    for c in ("query_id", "cand_id", "dot"):
        out[c] = out[c].astype(np.int64)
    return out[["query_id", "cand_id", "dot"]]


SQL_KNN_SQ8 = f"""
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
),
dots AS (
  SELECT qq.vec_id AS query_id, q.vec_id AS cand_id,
         CAST(SUM(qq.code * q.code) AS BIGINT) AS dot
  FROM q JOIN q AS qq ON qq.dim = q.dim
  WHERE qq.vec_id < {_N_QUERIES}
  GROUP BY qq.vec_id, q.vec_id
),
r AS (
  SELECT query_id, cand_id, dot,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY dot DESC, cand_id
         ) AS rn
  FROM dots
)
SELECT query_id, cand_id, dot
FROM r WHERE rn <= {_TOP_K}
ORDER BY query_id, dot DESC, cand_id
"""


ORACLE_QUERIES["knn_sq8"] = (q_knn_sq8, SQL_KNN_SQ8)
