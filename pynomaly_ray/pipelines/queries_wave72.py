"""Wave-72 query: recall@10 eval of the persisted IVF index.

``ivf_recall_eval`` — builds the on-disk IVF index (same layout as
``ivf_index_search``), answers 8 queries twice — once through the
probe-pruned index (nprobe=3 of 16), once by distributed brute force
over the FULL embeddings table — and reports the per-query overlap
``hits_at_10`` (|approx top-10 ∩ exact top-10|).  The ANN eval every
production index needs before anyone trusts its neighbors.

Certification: the probe PLAN and query vectors are persisted beside
the index; DuckDB recomputes BOTH rankings — the exact one over the
original ``embeddings`` view (certifying the engine's distributed
brute-force GEMM against the source table, not a surface), the
approximate one from plan × persisted inverted lists — and the same
intersection count.  Both sides rank on the e6-cosine grid with the
(score DESC, vec_id ASC) total order, so ties cannot diverge.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq

_IVF_K = 16
_NPROBE = 3
_TOPK = 10
_NQUERIES = 8


def q_ivf_recall_eval(sf_dir: str):
    import pyarrow.dataset as pads
    import pyarrow.parquet as papq

    import ray

    from pynomaly_ray.pipelines.engine_queries import _surface_dir
    from pynomaly_ray.sources.ivf_index import (
        ivf_probe_plan,
        ivf_search,
        write_ivf_index,
    )

    surf = _surface_dir("ivf_recall")
    index = os.path.join(surf, "index")
    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    write_ivf_index(emb, index, k=_IVF_K, n_iter=4)

    # deterministic query picks, offset from ivf_index_search's so the
    # two certifications exercise different probe routes
    meta = papq.read_metadata(os.path.join(sf_dir, "embeddings.parquet"))
    n = meta.num_rows
    step = n // _NQUERIES
    qids = [int(i * step + step // 2) for i in range(_NQUERIES)]
    qt = (
        papq.ParquetDataset(
            os.path.join(sf_dir, "embeddings.parquet"),
            filters=pads.field("vec_id").isin(qids),
        )
        .read(columns=["vec_id", "embedding"])
        .sort_by("vec_id")
    )
    qvecs = np.asarray(
        [qt["embedding"][i].as_py() for i in range(qt.num_rows)],
        dtype=np.float64,
    )

    plan = ivf_probe_plan(index, qvecs, _NPROBE)
    if len({int(c) for row in plan for c in row}) >= _IVF_K:
        raise AssertionError("probe plan covers every cluster — no pruning")

    qdir = os.path.join(surf, "queries")
    pdir = os.path.join(surf, "plan")
    os.makedirs(qdir, exist_ok=True)
    os.makedirs(pdir, exist_ok=True)
    papq.write_table(
        pa.table(
            {
                "query_id": pa.array(np.arange(len(qvecs), dtype=np.int64)),
                "embedding": qt["embedding"],
            }
        ),
        os.path.join(qdir, "queries.parquet"),
    )
    papq.write_table(
        pa.table(
            {
                "query_id": pa.array(
                    np.repeat(np.arange(len(qvecs), dtype=np.int64), _NPROBE)
                ),
                "cluster": pa.array(plan.reshape(-1)),
            }
        ),
        os.path.join(pdir, "plan.parquet"),
    )

    approx = ivf_search(index, qvecs, nprobe=_NPROBE, topk=_TOPK)

    # exact side: distributed brute force against the broadcast query
    # matrix — per-block local top-k (Q*k rows per block), tiny driver
    # merge.  Same e6 grid + (score DESC, vec_id ASC) order as the index
    # path, so the intersection below is tie-exact.
    qn = qvecs / np.linalg.norm(qvecs, axis=1, keepdims=True)
    qn_ref = ray.put(qn)

    def brute(t: pa.Table, _q=qn_ref) -> pa.Table:
        from pynomaly_ray.stages.similarity import _embedding_matrix

        Q = ray.get(_q)
        X = _embedding_matrix(t)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        e6 = np.floor(Q @ Xn.T * 1e6 + 0.5).astype(np.int64)
        out_q, out_i, out_s = [], [], []
        for qi in range(len(Q)):
            order = np.lexsort((ids, -e6[qi]))[:_TOPK]
            out_q.append(np.full(len(order), qi, dtype=np.int64))
            out_i.append(ids[order])
            out_s.append(e6[qi][order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_i)),
                "score_e6": pa.array(np.concatenate(out_s)),
            }
        )

    cand = (
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(brute, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
    )
    cand = cand.sort_values(
        ["query_id", "score_e6", "vec_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    exact = cand.groupby("query_id", sort=True).head(_TOPK)

    hits = []
    for qi in range(len(qvecs)):
        a = set(approx.loc[approx["query_id"] == qi, "vec_id"].tolist())
        e = set(exact.loc[exact["query_id"] == qi, "vec_id"].tolist())
        hits.append(len(a & e))
    return pd.DataFrame(
        {
            "query_id": pd.array(range(len(qvecs)), dtype="int64").to_numpy(
                dtype=np.int64
            ),
            "hits_at_10": np.asarray(hits, dtype=np.int64),
        }
    )


SQL_IVF_RECALL_EVAL = """
WITH q AS (
  SELECT query_id, embedding
  FROM read_parquet('/tmp/pnr_oracle_surface/ivf_recall/queries/*.parquet')
),
plan AS (
  SELECT query_id, cluster
  FROM read_parquet('/tmp/pnr_oracle_surface/ivf_recall/plan/*.parquet')
),
r AS (
  SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, embedding
  FROM read_parquet(
    '/tmp/pnr_oracle_surface/ivf_recall/index/clusters/*/*.parquet',
    hive_partitioning = 1
  )
),
exact AS (
  SELECT query_id, vec_id
  FROM (
    SELECT q.query_id, e.vec_id,
           CAST(FLOOR(list_cosine_similarity(
             e.embedding::DOUBLE[], q.embedding::DOUBLE[]
           ) * 1000000 + 0.5) AS BIGINT) AS score_e6
    FROM q CROSS JOIN embeddings e
  )
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score_e6 DESC, vec_id
  ) <= 10
),
approx AS (
  SELECT query_id, vec_id
  FROM (
    SELECT p.query_id, r.vec_id,
           CAST(FLOOR(list_cosine_similarity(
             r.embedding::DOUBLE[], q.embedding::DOUBLE[]
           ) * 1000000 + 0.5) AS BIGINT) AS score_e6
    FROM plan p
    JOIN r ON r.cluster = p.cluster
    JOIN q ON q.query_id = p.query_id
  )
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score_e6 DESC, vec_id
  ) <= 10
)
SELECT q.query_id,
       CAST(COUNT(e.vec_id) AS BIGINT) AS hits_at_10
FROM (SELECT DISTINCT query_id FROM q) q
LEFT JOIN approx a ON a.query_id = q.query_id
LEFT JOIN exact e
  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY q.query_id
ORDER BY q.query_id
"""


ORACLE_QUERIES["ivf_recall_eval"] = (q_ivf_recall_eval, SQL_IVF_RECALL_EVAL)
