"""Wave-71/72 queries: persisted IVF vector-index search.

``ivf_index_search`` — builds the on-disk IVF index
(``sources/ivf_index``: k-means centroids + one ``clusters/cluster=<c>/``
hive partition per inverted list, committed by the ``_ivf.json``
manifest), plans nprobe=3 of k=16 centroids per query, and serves
top-5 e6-cosine neighbors reading ONLY the probed partitions (the
reader asserts in-code that no file outside the plan is opened).

Certification (surface-oracle pattern): the probe PLAN and the query
vectors are materialized beside the index; DuckDB re-runs the search —
join plan × persisted inverted lists × queries, exact e6-grid cosine,
ROW_NUMBER (score DESC, id ASC) top-5 — from the same bytes, so the
hash match certifies the index layout, the partition routing, AND the
rank math.  Only the centroid fit itself is SQL-opaque (pinned by the
clustering pytests; a perturbed fit would change the plan surface and
break the match anyway).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq

_IVF_K = 16
_NPROBE = 3
_TOPK = 5
_NQUERIES = 8


def q_ivf_index_search(sf_dir: str):
    import pyarrow.parquet as papq

    from pynomaly_ray.pipelines.engine_queries import _surface_dir
    from pynomaly_ray.sources.ivf_index import (
        ivf_probe_plan,
        ivf_search,
        write_ivf_index,
    )

    surf = _surface_dir("ivf_index")
    index = os.path.join(surf, "index")
    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    write_ivf_index(emb, index, k=_IVF_K, n_iter=4)

    # deterministic query picks spread over the id range
    meta = papq.read_metadata(os.path.join(sf_dir, "embeddings.parquet"))
    n = meta.num_rows
    qids = [int(i * (n // _NQUERIES)) for i in range(_NQUERIES)]
    import pyarrow.dataset as pads

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
                "query_id": pa.array(
                    np.arange(len(qvecs), dtype=np.int64)
                ),
                "embedding": qt["embedding"],
            }
        ),
        os.path.join(qdir, "queries.parquet"),
    )
    papq.write_table(
        pa.table(
            {
                "query_id": pa.array(
                    np.repeat(
                        np.arange(len(qvecs), dtype=np.int64), _NPROBE
                    )
                ),
                "cluster": pa.array(plan.reshape(-1)),
            }
        ),
        os.path.join(pdir, "plan.parquet"),
    )

    out = ivf_search(index, qvecs, nprobe=_NPROBE, topk=_TOPK)
    return out[["query_id", "vec_id", "score_e6"]]


SQL_IVF_INDEX_SEARCH = """
WITH plan AS (
  SELECT query_id, cluster
  FROM read_parquet('/tmp/pnr_oracle_surface/ivf_index/plan/*.parquet')
),
q AS (
  SELECT query_id, embedding
  FROM read_parquet('/tmp/pnr_oracle_surface/ivf_index/queries/*.parquet')
),
r AS (
  SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, embedding
  FROM read_parquet(
    '/tmp/pnr_oracle_surface/ivf_index/index/clusters/*/*.parquet',
    hive_partitioning = 1
  )
),
scored AS (
  SELECT p.query_id, r.vec_id,
         CAST(FLOOR(list_cosine_similarity(
           r.embedding::DOUBLE[], q.embedding::DOUBLE[]
         ) * 1000000 + 0.5) AS BIGINT) AS score_e6
  FROM plan p
  JOIN r ON r.cluster = p.cluster
  JOIN q ON q.query_id = p.query_id
)
SELECT query_id, vec_id, score_e6
FROM scored
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY query_id ORDER BY score_e6 DESC, vec_id
) <= 5
ORDER BY query_id, score_e6 DESC, vec_id
"""


ORACLE_QUERIES["ivf_index_search"] = (
    q_ivf_index_search,
    SQL_IVF_INDEX_SEARCH,
)
