"""Wave-23 pipelines: skew-salted joins and cross-table integrity.

- ``salted_hot_join`` — the hot-key playbook, certified by an oracle:
  the join key is deliberately collapsed to TEN values (o_orderkey %
  10), which a plain hash join would funnel into ten buckets no
  matter the fan-out.  The left (fact) side salts each row into
  ``_SALT`` sub-keys with :func:`salt_of`'s independent mix; the
  right (dim) side replicates each row once per salt value; the join
  runs on (key, salt) — spreading each hot key over ``_SALT`` buckets
  — and the per-bucket merge_fn pre-collapses so only (key, partial)
  rows leave the exchange.  Values match the unsalted SQL twin
  exactly, proving salting changes the schedule, never the result.
- ``embedding_coverage`` — pipeline-integrity audit between two
  tables: how many documents lack an embedding row and how many
  embeddings point at no document, as one exact summary row
  (semi/anti counts from map-side key partials — no row-level join
  output ever materializes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    anti_membership,
    hash_aggregate,
    hash_join,
)
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _cents, _pq

_SALT = 16
_HOT_MOD = 10


def q_salted_hot_join(sf_dir: str):
    from pynomaly_ray.functions.hashing import salt_of

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def fact_salted(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {
                "hot_key": pa.array(ok % _HOT_MOD),
                # salt on the ORIGINAL key so the same row always gets
                # the same salt (retry-deterministic), while rows of one
                # hot key spread across _SALT sub-buckets
                "salt": pa.array(salt_of(ok, _SALT)),
                "rev": pa.array(rev),
            }
        )

    # ten-row dimension: a per-hot-key integer weight, derived (not a
    # table) so the oracle can rebuild it: weight = key + 1
    dim = pd.DataFrame({"hot_key": np.arange(_HOT_MOD, dtype=np.int64)})
    dim["weight"] = dim["hot_key"] + 1
    # replicate once per salt value — the broadcast-side of salting
    rep = dim.loc[dim.index.repeat(_SALT)].reset_index(drop=True)
    rep["salt"] = np.tile(np.arange(_SALT, dtype=np.int64), _HOT_MOD)

    import ray.data as rd

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(w = df["rev"] * df["weight"])
        return (
            df.groupby("hot_key", sort=False)
            .agg(weighted_cents=("w", "sum"), n_lines=("rev", "size"))
            .reset_index()
        )

    joined = hash_join(
        li.map_batches(fact_salted, batch_format="pyarrow"),
        rd.from_pandas(rep),
        ["hot_key", "salt"],
        merge_fn=collapse,
    )
    out = hash_aggregate(
        joined,
        ["hot_key"],
        lambda df: df.groupby("hot_key", sort=False)
        .agg(
            weighted_cents=("weighted_cents", "sum"),
            n_lines=("n_lines", "sum"),
        )
        .reset_index(),
    ).to_pandas()
    if out.empty or "hot_key" not in out.columns:
        return pd.DataFrame(
            {
                "hot_key": pd.Series(dtype=np.int64),
                "weighted_cents": pd.Series(dtype=np.int64),
                "n_lines": pd.Series(dtype=np.int64),
            }
        )
    for c in ("hot_key", "weighted_cents", "n_lines"):
        out[c] = out[c].astype(np.int64)
    return (
        out[["hot_key", "weighted_cents", "n_lines"]]
        .sort_values("hot_key", kind="mergesort")
        .reset_index(drop=True)
    )


SQL_SALTED_HOT_JOIN = f"""
SELECT CAST(l_orderkey % {_HOT_MOD} AS BIGINT) AS hot_key,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT) * (l_orderkey % {_HOT_MOD} + 1))
            AS BIGINT) AS weighted_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY l_orderkey % {_HOT_MOD}
ORDER BY hot_key
"""

ORACLE_QUERIES["salted_hot_join"] = (q_salted_hot_join, SQL_SALTED_HOT_JOIN)


def q_embedding_coverage(sf_dir: str):
    docs = _pq(sf_dir, "documents", ["doc_id"])
    vecs = _pq(sf_dir, "embeddings", ["vec_id"])

    def doc_keys(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["doc_id"].cast(pa.int64())})

    def vec_keys(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["vec_id"].cast(pa.int64())})

    dk = docs.map_batches(doc_keys, batch_format="pyarrow").materialize()
    vk = vecs.map_batches(vec_keys, batch_format="pyarrow").materialize()
    n_docs = dk.count()
    n_vecs = vk.count()
    docs_unembedded = anti_membership(dk, vk, "k").count()
    vecs_orphaned = anti_membership(vk, dk, "k").count()
    return pd.DataFrame(
        {
            "n_docs": np.array([n_docs], np.int64),
            "n_vecs": np.array([n_vecs], np.int64),
            "docs_unembedded": np.array([docs_unembedded], np.int64),
            "vecs_orphaned": np.array([vecs_orphaned], np.int64),
        }
    )


SQL_EMBEDDING_COVERAGE = """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_vecs,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
   WHERE doc_id NOT IN (SELECT vec_id FROM embeddings)) AS docs_unembedded,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
   WHERE vec_id NOT IN (SELECT doc_id FROM documents)) AS vecs_orphaned
"""

ORACLE_QUERIES["embedding_coverage"] = (
    q_embedding_coverage,
    SQL_EMBEDDING_COVERAGE,
)
