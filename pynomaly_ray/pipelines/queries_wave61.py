"""Wave-61: per-vertex clustering coefficient (integer surface).

``clustering_coeff`` extends the suite's triangle machinery from the
one-number-per-apex count to the per-VERTEX local clustering
coefficient c_v = 2*T_v / (deg_v * (deg_v - 1)): every triangle
{a<b<c} found once as an ordered wedge closure now credits all THREE
corners, and the final surface carries exact integers (node, deg,
tri_cnt) — the ratio is the caller's one float.  Engine shape: the
distinct-edge exchange and the wedge self-join are shared verbatim with
``triangle_count``; the closing (v,w) join's merge_fn explodes each
triangle to its 3 corners and pre-counts INSIDE the bucket, so the
per-node stream leaving the join is bounded by the vertex domain, not
the triangle count.  Degree partials ride the same node-keyed exchange
as a second tagged stream (Dataset.union), making the deg/tri fold one
shuffle.  Skew: a hot apex bounds one wedge bucket at deg_max^2 — same
cap prescription as triangle_count; the hash-derived graph keeps
degrees Poisson-concentrated at every scale.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    collect_sorted,
    hash_aggregate,
    hash_join,
)
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq


def q_clustering_coeff(sf_dir: str):
    import pyarrow.parquet as papq

    from pynomaly_ray.functions.hashing import knuth32

    n_orders = papq.read_metadata(
        os.path.join(sf_dir, "orders.parquet")
    ).num_rows
    m = max(n_orders // 15, 10)

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def edges_of(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hu = knuth32(ok, 1) % m
        hv = knuth32(ck, 2) % m
        u = np.minimum(hu, hv)
        v = np.maximum(hu, hv)
        keep = u != v
        df = pd.DataFrame({"u": u[keep], "v": v[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    edges = hash_aggregate(
        orders.map_batches(edges_of, batch_format="pyarrow"),
        ["u", "v"],
        lambda df: df.drop_duplicates(["u", "v"]),
    ).materialize()

    def rename_w(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["u"], "w": t["v"]})

    def wedge_merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["v"] < df["w"]]
        return pd.DataFrame(
            {
                "apex": df["u"].to_numpy(np.int64),
                "v": df["v"].to_numpy(np.int64),
                "w": df["w"].to_numpy(np.int64),
            }
        )

    wedges = hash_join(
        edges,
        edges.map_batches(rename_w, batch_format="pyarrow"),
        ["u"],
        merge_fn=wedge_merge,
    )

    def close_edges(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["u"], "w": t["v"]})

    def corner_merge(df: pd.DataFrame) -> pd.DataFrame:
        corners = np.concatenate(
            [
                df["apex"].to_numpy(np.int64),
                df["v"].to_numpy(np.int64),
                df["w"].to_numpy(np.int64),
            ]
        )
        keys, counts = np.unique(corners, return_counts=True)
        return pd.DataFrame(
            {
                "node": keys,
                "dcnt": np.zeros(len(keys), dtype=np.int64),
                "tcnt": counts.astype(np.int64),
            }
        )

    tri_partials = hash_join(
        wedges,
        edges.map_batches(close_edges, batch_format="pyarrow"),
        ["v", "w"],
        merge_fn=corner_merge,
    )

    def degree_partials(t: pa.Table) -> pa.Table:
        ends = np.concatenate(
            [
                t["u"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["v"].to_numpy(zero_copy_only=False).astype(np.int64),
            ]
        )
        keys, counts = np.unique(ends, return_counts=True)
        return _from_pandas(
            pd.DataFrame(
                {
                    "node": keys,
                    "dcnt": counts.astype(np.int64),
                    "tcnt": np.zeros(len(keys), dtype=np.int64),
                }
            )
        )

    deg_stream = edges.map_batches(degree_partials, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("node", sort=False)[["dcnt", "tcnt"]]
            .sum()
            .reset_index()
        )
        return out.rename(columns={"dcnt": "deg", "tcnt": "tri_cnt"})

    merged = hash_aggregate(deg_stream.union(tri_partials), ["node"], fold)
    df = collect_sorted(merged, ["node"])
    df["node"] = df["node"].astype(np.int64)
    df["deg"] = df["deg"].astype(np.int64)
    df["tri_cnt"] = df["tri_cnt"].astype(np.int64)
    return df[["node", "deg", "tri_cnt"]]


SQL_CLUSTERING_COEFF = """
WITH m AS (
  SELECT GREATEST(CAST(COUNT(*) / 15 AS BIGINT), 10) AS m FROM orders
),
h AS (
  SELECT CAST(((o_orderkey + 1) % 4294967296) * 2654435761::HUGEINT
              % 4294967296 AS BIGINT) AS hu,
         CAST(((o_custkey + 2) % 4294967296) * 2654435761::HUGEINT
              % 4294967296 AS BIGINT) AS hv
  FROM orders
),
e AS (
  SELECT DISTINCT LEAST(hu % m.m, hv % m.m) AS u,
                  GREATEST(hu % m.m, hv % m.m) AS v
  FROM h CROSS JOIN m
  WHERE hu % m.m <> hv % m.m
),
t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
tc AS (
  SELECT node, COUNT(*) AS cnt FROM (
    SELECT a AS node FROM t
    UNION ALL SELECT b FROM t
    UNION ALL SELECT c FROM t
  ) GROUP BY node
),
dg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e
  ) GROUP BY node
)
SELECT dg.node, CAST(dg.deg AS BIGINT) AS deg,
       CAST(COALESCE(tc.cnt, 0) AS BIGINT) AS tri_cnt
FROM dg LEFT JOIN tc ON dg.node = tc.node
ORDER BY dg.node
"""


ORACLE_QUERIES["clustering_coeff"] = (q_clustering_coeff, SQL_CLUSTERING_COEFF)
