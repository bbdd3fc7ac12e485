"""Wave-24 pipeline: HITS hubs/authorities as pure integer algebra.

``hits_scores`` runs two unrolled HITS iterations over the derived
order graph treated as DIRECTED (u -> v): starting from all-ones
authorities, ``hub = A @ auth`` then ``auth' = A^T @ hub`` — with NO
normalization step, every score is a plain integer path count
(hub = #length-1 out-paths weighted by downstream authority, auth' =
#length-2 paths ending at the node), so integer sums make the
distributed reduction bit-equal to the chained-CTE SQL twin.  This
complements ``pagerank`` (division-free: certifies the pure
join-aggregate matrix-vector product) — the renormalized variant is a
one-line map over these integers.

Each half-iteration is one hash join (scores onto edges at the
matching endpoint, pre-collapsed per bucket) plus one hash aggregate —
the same exchange count a matrix-vector product costs at any scale.
Nodes with no out-edges carry hub 0 (and symmetrically for
authorities); the node roll LEFT-join keeps them present.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    collect_sorted,
    hash_aggregate,
    hash_join,
)
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES
from pynomaly_ray.pipelines.queries_wave19 import derived_edges


def _directed_edges(sf_dir: str):
    """The derived graph with its ORIGINAL orientation (hu -> hv),
    distinct — hubs and authorities are only meaningful on a digraph."""
    import os

    import pyarrow.parquet as papq

    from pynomaly_ray.functions.hashing import knuth32
    from pynomaly_ray.pipelines.queries import _pq

    n_orders = papq.read_metadata(
        os.path.join(sf_dir, "orders.parquet")
    ).num_rows
    m = max(n_orders // 15, 10)
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def edges_of(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = knuth32(ok, 1) % m
        v = knuth32(ck, 2) % m
        keep = u != v
        df = pd.DataFrame({"u": u[keep], "v": v[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return hash_aggregate(
        orders.map_batches(edges_of, batch_format="pyarrow"),
        ["u", "v"],
        lambda df: df.drop_duplicates(["u", "v"]),
    ).materialize()


def _matvec(edges, scores, score_col: str, from_col: str, to_col: str,
            out_col: str):
    """out[x] = sum over edges (from=y, to=x) of scores[y] — one hash
    join (scores onto edges at ``from_col``, per-bucket pre-collapse)
    plus one aggregate on ``to_col``."""

    def as_from(t: pa.Table) -> pa.Table:
        return pa.table({from_col: t["node"], "sc": t[score_col]})

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(to_col, sort=False)["sc"]
            .sum()
            .reset_index(name=out_col)
        )

    partial = hash_join(
        edges,
        scores.map_batches(as_from, batch_format="pyarrow"),
        [from_col],
        merge_fn=collapse,
    )

    def as_node(t: pa.Table) -> pa.Table:
        return pa.table({"node": t[to_col], out_col: t[out_col]})

    return hash_aggregate(
        partial.map_batches(as_node, batch_format="pyarrow"),
        ["node"],
        lambda df: df.groupby("node", sort=False)[out_col]
        .sum()
        .reset_index(),
    )


def q_hits_scores(sf_dir: str):
    edges = _directed_edges(sf_dir)

    def both_ends(t: pa.Table) -> pa.Table:
        uu = t["u"].to_numpy(zero_copy_only=False)
        vv = t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.unique(np.concatenate([uu, vv])))}
        )

    nodes = hash_aggregate(
        edges.map_batches(both_ends, batch_format="pyarrow"),
        ["node"],
        lambda df: df.drop_duplicates(["node"]),
    ).materialize()
    if nodes.count() == 0:
        return pd.DataFrame(
            {
                "node": pd.Series(dtype=np.int64),
                "hub": pd.Series(dtype=np.int64),
                "auth": pd.Series(dtype=np.int64),
            }
        )

    def ones(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "auth": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    auth0 = nodes.map_batches(ones, batch_format="pyarrow")
    # hub[u] = sum_{u->v} auth0[v]   (A @ auth)
    hub1 = _matvec(edges, auth0, "auth", "v", "u", "hub").materialize()
    # auth[v] = sum_{u->v} hub1[u]   (A^T @ hub)
    auth1 = _matvec(edges, hub1, "hub", "u", "v", "auth").materialize()

    # one exchange instead of three node-sized joins: the node roll
    # (as all-zero rows), hub partials and auth partials union into a
    # single keyed aggregate — hub1/auth1 carry at most one row per
    # node, so per-node SUM with 0-fill is exactly COALESCE(x, 0)
    def align(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        return pa.table(
            {
                "node": t["node"],
                "hub": t["hub"] if "hub" in t.schema.names else z,
                "auth": t["auth"] if "auth" in t.schema.names else z,
            }
        )

    def sum_fill(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("node", sort=False)[["hub", "auth"]]
            .sum()
            .reset_index()
        )
        return g.astype(np.int64)

    out = hash_aggregate(
        nodes.map_batches(align, batch_format="pyarrow")
        .union(hub1.map_batches(align, batch_format="pyarrow"))
        .union(auth1.map_batches(align, batch_format="pyarrow")),
        ["node"],
        sum_fill,
    )
    df = collect_sorted(out, ["node"])
    for c in ("node", "hub", "auth"):
        df[c] = df[c].astype(np.int64)
    return df[["node", "hub", "auth"]]


SQL_HITS_SCORES = """
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
  SELECT DISTINCT hu % m.m AS u, hv % m.m AS v
  FROM h CROSS JOIN m
  WHERE hu % m.m <> hv % m.m
),
nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
hub1 AS (
  SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS hub FROM e GROUP BY u
),
auth1 AS (
  SELECT e.v AS node, CAST(SUM(hub1.hub) AS BIGINT) AS auth
  FROM e JOIN hub1 ON hub1.node = e.u
  GROUP BY e.v
)
SELECT nodes.node,
       CAST(COALESCE(hub1.hub, 0) AS BIGINT) AS hub,
       CAST(COALESCE(auth1.auth, 0) AS BIGINT) AS auth
FROM nodes
LEFT JOIN hub1 USING (node)
LEFT JOIN auth1 USING (node)
ORDER BY node
"""

ORACLE_QUERIES["hits_scores"] = (q_hits_scores, SQL_HITS_SCORES)
