"""Wave-22 pipelines: frontier graph traversal and market-basket
co-occurrence.

- ``bfs_hops`` — multi-source BFS over the derived order graph
  (undirected), bounded at 4 hops: the symmetrized adjacency (both
  orientations of every edge) is hash-partitioned ONCE into a
  :class:`PartitionedTable`; per round the frontier probes it (one
  join, frontier-sized exchange only), newly-reached nodes are carved
  out with :func:`anti_membership` against the visited roll, and the
  round stamp becomes their hop distance.  Frontier size — not corpus
  size — bounds each round's exchange.  The oracle is a DuckDB RECURSIVE CTE
  with UNION (set semantics: the working table stays at most one row
  per (node, depth), so path multiplicity never explodes) reduced by
  MIN(depth).
- ``basket_pairs`` — parts co-purchased in the same order, with
  support counts: the self-join on the orderkey happens INSIDE the
  exchange's bucket reducers (orderkey co-location), emitting ordered
  (a < b) pairs; pair volume is sum-of-squares of basket sizes —
  linear when baskets are small, and a hot basket bounds one bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    PartitionedTable,
    anti_membership,
    collect_sorted,
    hash_aggregate,
)
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq
from pynomaly_ray.pipelines.queries_wave19 import derived_edges

_BFS_HOPS = 4
_BFS_SEED_MOD = 50


def q_bfs_hops(sf_dir: str):
    import ray.data as rd

    edges = derived_edges(sf_dir)  # columns u < v, distinct

    def seeds_of(t: pa.Table) -> pa.Table:
        uu = t["u"].to_numpy(zero_copy_only=False)
        vv = t["v"].to_numpy(zero_copy_only=False)
        nodes = np.unique(np.concatenate([uu, vv]))
        nodes = nodes[nodes % _BFS_SEED_MOD == 0]
        return pa.table({"node": pa.array(nodes)})

    frontier = hash_aggregate(
        edges.map_batches(seeds_of, batch_format="pyarrow"),
        ["node"],
        lambda df: df.drop_duplicates(["node"]),
    ).materialize()

    def stamp(ds, hop: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t["node"],
                    "hop": pa.array(
                        np.full(t.num_rows, hop, dtype=np.int64)
                    ),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow")

    # undirected adjacency as ONE build-once partitioned surface: each
    # (u,v) edge contributes both orientations (src->dst), partitioned
    # on src exactly once — every BFS round probes it with the frontier
    # instead of re-exchanging O(E) edges twice per round
    def symmetrize(t: pa.Table) -> pa.Table:
        uu = t["u"].to_numpy(zero_copy_only=False)
        vv = t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([uu, vv])),
                "dst": pa.array(np.concatenate([vv, uu])),
            }
        )

    adj_pt = PartitionedTable(
        edges.map_batches(symmetrize, batch_format="pyarrow"), ["src"]
    )

    reached = [stamp(frontier, 0).materialize()]
    visited = frontier
    for hop in range(1, _BFS_HOPS + 1):
        if frontier.count() == 0:
            break

        def as_src(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["node"]})

        neigh = hash_aggregate(
            adj_pt.join(
                frontier.map_batches(as_src, batch_format="pyarrow"),
                merge_fn=lambda df: pd.DataFrame(
                    {"node": df["dst"].drop_duplicates().to_numpy(np.int64)}
                ),
            ),
            ["node"],
            lambda df: df.drop_duplicates(["node"]),
        )
        frontier = anti_membership(neigh, visited, "node").materialize()
        if frontier.count() == 0:
            break
        reached.append(stamp(frontier, hop).materialize())
        visited = visited.union(frontier).materialize()

    out = reached[0]
    for r in reached[1:]:
        out = out.union(r)
    df = collect_sorted(out, ["node"])
    if df.empty or "node" not in df.columns:
        return pd.DataFrame(
            {
                "node": pd.Series(dtype=np.int64),
                "hop": pd.Series(dtype=np.int64),
            }
        )
    df["node"] = df["node"].astype(np.int64)
    df["hop"] = df["hop"].astype(np.int64)
    return df[["node", "hop"]]


SQL_BFS_HOPS = f"""
WITH RECURSIVE m AS (
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
nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
reach AS (
  SELECT node, 0 AS d FROM nodes WHERE node % {_BFS_SEED_MOD} = 0
  UNION
  SELECT nxt.node, reach.d + 1
  FROM reach
  JOIN (
    SELECT u AS src, v AS node FROM e
    UNION ALL
    SELECT v AS src, u AS node FROM e
  ) nxt ON nxt.src = reach.node
  WHERE reach.d < {_BFS_HOPS}
)
SELECT node, CAST(MIN(d) AS BIGINT) AS hop
FROM reach
GROUP BY node
ORDER BY node
"""

ORACLE_QUERIES["bfs_hops"] = (q_bfs_hops, SQL_BFS_HOPS)


def q_basket_pairs(sf_dir: str):
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def slim(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "l_partkey": t["l_partkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def pairs_of(df: pd.DataFrame) -> pd.DataFrame:
        # in-bucket basket expansion: orderkey co-location makes the
        # self-join local; emit ordered pairs a < b per order
        df = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = df.merge(df, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        return (
            m.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
            .size()
            .reset_index(name="n_orders")
        )

    pair_partials = hash_aggregate(
        li.map_batches(slim, batch_format="pyarrow"),
        ["l_orderkey"],
        pairs_of,
    )
    counts = hash_aggregate(
        pair_partials,
        ["l_partkey_a", "l_partkey_b"],
        lambda df: df.groupby(["l_partkey_a", "l_partkey_b"], sort=False)[
            "n_orders"
        ]
        .sum()
        .reset_index(),
    )

    def support(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.greater_equal(t["n_orders"], pa.scalar(2, pa.int64()))
        )

    out = counts.map_batches(support, batch_format="pyarrow")
    df = collect_sorted(out, ["l_partkey_a", "l_partkey_b"])
    if df.empty or "l_partkey_a" not in df.columns:
        return pd.DataFrame(
            {
                "l_partkey_a": pd.Series(dtype=np.int64),
                "l_partkey_b": pd.Series(dtype=np.int64),
                "n_orders": pd.Series(dtype=np.int64),
            }
        )
    for c in ("l_partkey_a", "l_partkey_b", "n_orders"):
        df[c] = df[c].astype(np.int64)
    return df[["l_partkey_a", "l_partkey_b", "n_orders"]]


SQL_BASKET_PAIRS = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS l_partkey_a,
       c.l_partkey AS l_partkey_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM b a JOIN b c
  ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
GROUP BY a.l_partkey, c.l_partkey
HAVING COUNT(*) >= 2
ORDER BY l_partkey_a, l_partkey_b
"""

ORACLE_QUERIES["basket_pairs"] = (q_basket_pairs, SQL_BASKET_PAIRS)
