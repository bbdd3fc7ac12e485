"""Wave-63: per-edge common-neighbor counts (link-prediction features).

``common_neighbors`` — for every edge (u,v) of the derived graph, the
exact number of shared neighbors |N(u)∩N(v)| plus both endpoint
degrees: the classic link-prediction feature triple (common-neighbor
count, and Jaccard/Adamic-Adar denominators |N(u)∪N(v)| =
deg_u + deg_v − 2 − common derive from it at read time).  A triangle
{a<b<c} is found once as an ordered wedge closure and credits all
three of its EDGES — the per-edge dual of wave-61's per-vertex corner
credit.  Engine shape: the closing (v,w) join's merge_fn explodes each
triangle to its 3 edges and pre-counts inside the bucket; zero-common
edges enter through a tagged union with the edge set itself; degree
decoration is two node-keyed hash joins (never a broadcast — the
vertex domain scales with the corpus).
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


def q_common_neighbors(sf_dir: str):
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

    def edge_credit(df: pd.DataFrame) -> pd.DataFrame:
        # triangle (apex < v < w) credits edges (apex,v), (apex,w), (v,w)
        a = df["apex"].to_numpy(np.int64)
        b = df["v"].to_numpy(np.int64)
        c = df["w"].to_numpy(np.int64)
        eu = np.concatenate([a, a, b])
        ev = np.concatenate([b, c, c])
        d = (
            pd.DataFrame({"u": eu, "v": ev, "ccnt": np.int64(1)})
            .groupby(["u", "v"], sort=False)
            .sum()
            .reset_index()
        )
        return d

    tri_partials = hash_join(
        wedges,
        edges.map_batches(close_edges, batch_format="pyarrow"),
        ["v", "w"],
        merge_fn=edge_credit,
    )

    def zero_credit(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": t["u"],
                "v": t["v"],
                "ccnt": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    per_edge = hash_aggregate(
        edges.map_batches(zero_credit, batch_format="pyarrow").union(
            tri_partials
        ),
        ["u", "v"],
        lambda df: df.groupby(["u", "v"], sort=False)["ccnt"]
        .sum()
        .reset_index()
        .rename(columns={"ccnt": "common"}),
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
            pd.DataFrame({"node": keys, "dcnt": counts.astype(np.int64)})
        )

    degrees = hash_aggregate(
        edges.map_batches(degree_partials, batch_format="pyarrow"),
        ["node"],
        lambda df: df.groupby("node", sort=False)["dcnt"].sum().reset_index(),
    ).materialize()

    def as_u(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["node"], "deg_u": t["dcnt"]})

    def as_v(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["node"], "deg_v": t["dcnt"]})

    with_du = hash_join(
        per_edge, degrees.map_batches(as_u, batch_format="pyarrow"), ["u"]
    )
    with_both = hash_join(
        with_du, degrees.map_batches(as_v, batch_format="pyarrow"), ["v"]
    )
    df = collect_sorted(with_both, ["u", "v"])
    for c in ["u", "v", "common", "deg_u", "deg_v"]:
        df[c] = df[c].astype(np.int64)
    return df[["u", "v", "common", "deg_u", "deg_v"]]


SQL_COMMON_NEIGHBORS = """
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
cc AS (
  SELECT u, v, COUNT(*) AS common FROM (
    SELECT a AS u, b AS v FROM t
    UNION ALL SELECT a, c FROM t
    UNION ALL SELECT b, c FROM t
  ) GROUP BY u, v
),
dg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e
  ) GROUP BY node
)
SELECT e.u, e.v,
       CAST(COALESCE(cc.common, 0) AS BIGINT) AS common,
       CAST(du.deg AS BIGINT) AS deg_u,
       CAST(dv.deg AS BIGINT) AS deg_v
FROM e
LEFT JOIN cc ON e.u = cc.u AND e.v = cc.v
JOIN dg du ON du.node = e.u
JOIN dg dv ON dv.node = e.v
ORDER BY e.u, e.v
"""


ORACLE_QUERIES["common_neighbors"] = (
    q_common_neighbors,
    SQL_COMMON_NEIGHBORS,
)
