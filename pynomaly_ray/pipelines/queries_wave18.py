"""Wave-18 query pipelines: iterative distributed graph compute with
an exact SQL twin, and the global-scalar / distinct-count analytics
shapes (TPC-H Q11 / Q16 families).

- ``pagerank`` — power iteration over the derived order graph, run as
  INTEGER arithmetic end-to-end: ranks are e12-scaled int64, each
  edge's contribution is ``(85 * r) // (100 * out_degree)`` (floor
  division), the teleport base is a shared integer constant.  Integer
  sums are associative, so the distributed per-destination reduction
  is bit-identical to DuckDB's — the oracle unrolls three iterations
  as chained CTEs and the value hash must match exactly.  This is the
  engine's iterative-compute certification: the same join-aggregate
  round the connected-components and LoOP-drift loops use, but with a
  hash-checkable numeric fixpoint trace.
- ``important_parts`` — Q11 shape: per-group aggregate filtered by a
  GLOBAL scalar (share-of-total HAVING).  The total is reduced from
  map-side partials (one tiny driver scalar — never a second scan) and
  pushed into the group filter as an integer threshold.
- ``brand_supplier_counts`` — Q16 shape: COUNT(DISTINCT supplier) per
  (brand, type) with an excluded-supplier anti-join
  (:func:`anti_membership` — broadcast under the cap, partitioned
  above).  Distinctness is resolved inside the exchange reducers:
  (brand, type) co-location implies (brand, type, supplier)
  co-location, so one exchange both dedups and counts.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    PartitionedTable,
    anti_membership,
    collect_sorted,
    hash_aggregate,
    hash_join,
)
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _cents, _pq


# ---------------------------------------------------------------------------
# Q: pagerank — 3 power iterations, integer-exact.
# ---------------------------------------------------------------------------
_PR_ITERS = 3
_PR_SCALE = 1_000_000_000_000  # e12 rank fixed-point


def pagerank_edges(sf_dir: str):
    """The DIRECTED derived graph (hu -> hv, distinct) PageRank runs
    on — shared with the checkpointed driver in state/iteration.py so
    both walk the identical edge set."""
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


def q_pagerank(sf_dir: str):
    import ray.data as rd

    edges = pagerank_edges(sf_dir)

    # out-degree per source, attached to every edge ONCE (reused each
    # iteration; at scale this is the expensive exchange, paid once)
    deg = hash_aggregate(
        edges,
        ["u"],
        lambda df: df.groupby("u", sort=False)
        .size()
        .reset_index(name="d")
        .astype(np.int64),
    )
    # build-once partitioned edge surface: every iteration probes this
    # with the (small) rank vector instead of re-exchanging O(E) edges —
    # at scale the static exchange is paid once, not once per iteration
    edges_pt = PartitionedTable(hash_join(edges, deg, ["u"]), ["u"])

    # node roll: distinct endpoints (drives N and the per-iteration
    # LEFT join so in-degree-0 nodes keep their teleport base)
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
    n = nodes.count()
    if n == 0:
        return pd.DataFrame(
            {
                "node": pd.Series(dtype=np.int64),
                "rank_e12": pd.Series(dtype=np.int64),
            }
        )
    r0 = _PR_SCALE // n
    base = (15 * _PR_SCALE) // (100 * n)

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "r": pa.array(
                    np.full(t.num_rows, r0, dtype=np.int64)
                ),
            }
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow")
    # the node roll is also static across iterations: partition once
    nodes_pt = PartitionedTable(nodes, ["node"])

    for _ in range(_PR_ITERS):

        def as_u(t: pa.Table) -> pa.Table:
            return pa.table({"u": t["node"], "r": t["r"]})

        def contrib_merge(df: pd.DataFrame) -> pd.DataFrame:
            c = (85 * df["r"].to_numpy(np.int64)) // (
                100 * df["d"].to_numpy(np.int64)
            )
            return (
                pd.DataFrame({"v": df["v"].to_numpy(np.int64), "s": c})
                .groupby("v", sort=False)["s"]
                .sum()
                .reset_index()
            )

        sums = edges_pt.join(
            ranks.map_batches(as_u, batch_format="pyarrow"),
            merge_fn=contrib_merge,
        )

        def as_node(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["v"], "s": t["s"]})

        def next_rank(df: pd.DataFrame) -> pd.DataFrame:
            s = df["s"].fillna(0).astype(np.int64)
            return pd.DataFrame(
                {
                    "node": df["node"].to_numpy(np.int64),
                    "r": (base + s).to_numpy(np.int64),
                }
            )

        ranks = nodes_pt.join(
            hash_aggregate(
                sums.map_batches(as_node, batch_format="pyarrow"),
                ["node"],
                lambda df: df.groupby("node", sort=False)["s"]
                .sum()
                .reset_index(),
            ),
            how="left",
            merge_fn=next_rank,
        ).materialize()

    out = collect_sorted(ranks, ["node"])
    out = out.rename(columns={"r": "rank_e12"})
    out["node"] = out["node"].astype(np.int64)
    out["rank_e12"] = out["rank_e12"].astype(np.int64)
    return out[["node", "rank_e12"]]


def _sql_pr_step(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT nodes.node,
         bb.b + COALESCE(c.s, 0) AS r
  FROM nodes CROSS JOIN bb
  LEFT JOIN (
    SELECT e.v AS node,
           CAST(SUM((85 * p.r) // (100 * deg.d)) AS BIGINT) AS s
    FROM e
    JOIN {prev} p ON p.node = e.u
    JOIN deg ON deg.u = e.u
    GROUP BY e.v
  ) c USING (node)
)"""


SQL_PAGERANK = (
    """
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
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY u),
bb AS (
  SELECT CAST((15 * 1000000000000) // (100 * n) AS BIGINT) AS b FROM nn
),
p0 AS (
  SELECT node, CAST(1000000000000 // nn.n AS BIGINT) AS r
  FROM nodes CROSS JOIN nn
),"""
    + ",".join(
        _sql_pr_step(f"p{i}", f"p{i + 1}") for i in range(_PR_ITERS)
    )
    + f"""
SELECT node, CAST(r AS BIGINT) AS rank_e12
FROM p{_PR_ITERS}
ORDER BY node
"""
)

ORACLE_QUERIES["pagerank"] = (q_pagerank, SQL_PAGERANK)


# ---------------------------------------------------------------------------
# Q: important_parts — Q11 shape: parts whose revenue exceeds
# 1/2000th of TOTAL revenue.  The global scalar comes from the SAME
# map-side partials that feed the per-part aggregate — one scan, one
# exchange, one broadcast integer.
# ---------------------------------------------------------------------------
def q_important_parts(sf_dir: str):
    li = _pq(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        )
        df = (
            pd.DataFrame(
                {
                    "l_partkey": t["l_partkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "rev": rev,
                }
            )
            .groupby("l_partkey", sort=False)["rev"]
            .sum()
            .reset_index(name="part_rev_cents")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = li.map_batches(partial, batch_format="pyarrow").materialize()
    per_part = hash_aggregate(
        parts,
        ["l_partkey"],
        lambda df: df.groupby("l_partkey", sort=False)["part_rev_cents"]
        .sum()
        .reset_index(),
    ).materialize()

    # the global scalar: sum of the SAME partials (associative ints)
    def tot_of(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.sum(t["part_rev_cents"]).as_py() or 0
        return pa.table({"t": pa.array([s], pa.int64())})

    tot = sum(
        r["t"]
        for r in per_part.map_batches(
            tot_of, batch_format="pyarrow"
        ).take_all()
    )
    threshold = tot // 2000

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.greater(t["part_rev_cents"], pa.scalar(threshold, pa.int64()))
        )

    out = per_part.map_batches(keep, batch_format="pyarrow")
    df = collect_sorted(out, ["l_partkey"])
    if df.empty or "l_partkey" not in df.columns:
        return pd.DataFrame(
            {
                "l_partkey": pd.Series(dtype=np.int64),
                "part_rev_cents": pd.Series(dtype=np.int64),
            }
        )
    df["l_partkey"] = df["l_partkey"].astype(np.int64)
    df["part_rev_cents"] = df["part_rev_cents"].astype(np.int64)
    return df[["l_partkey", "part_rev_cents"]]


SQL_IMPORTANT_PARTS = """
WITH c AS (
  SELECT l_partkey,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS rev
  FROM lineitem
),
tot AS (SELECT CAST(SUM(rev) AS BIGINT) // 2000 AS threshold FROM c)
SELECT l_partkey, CAST(SUM(rev) AS BIGINT) AS part_rev_cents
FROM c CROSS JOIN tot
GROUP BY l_partkey, tot.threshold
HAVING CAST(SUM(rev) AS BIGINT) > tot.threshold
ORDER BY l_partkey
"""

ORACLE_QUERIES["important_parts"] = (q_important_parts, SQL_IMPORTANT_PARTS)


# ---------------------------------------------------------------------------
# Q: brand_supplier_counts — Q16 shape: distinct suppliers per
# (brand, type), excluding flagged suppliers via anti_membership.
# ---------------------------------------------------------------------------
def q_brand_supplier_counts(sf_dir: str):
    import pyarrow.dataset as pads
    import pyarrow.parquet as papq

    from pynomaly_ray.sources.parquet import read_parquet_clean

    li = _pq(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def li_slim(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": t["l_partkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "l_suppkey": t["l_suppkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = hash_aggregate(
        li.map_batches(li_slim, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"],
        lambda df: df.drop_duplicates(["l_partkey", "l_suppkey"]),
    )

    # flagged suppliers (the Q16 "complaints" analog): negative balance
    sup_path = os.path.join(sf_dir, "supplier.parquet")
    bad = read_parquet_clean(
        sup_path,
        columns=["s_suppkey"],
        filter=pads.field("s_acctbal") < 0.0,
        override_num_blocks=1,
    )

    def bad_slim(t: pa.Table) -> pa.Table:
        return pa.table({"l_suppkey": t["s_suppkey"].cast(pa.int64())})

    kept = anti_membership(
        pairs,
        bad.map_batches(bad_slim, batch_format="pyarrow"),
        "l_suppkey",
    )

    part = _pq(sf_dir, "part", ["p_partkey", "p_brand", "p_type"])

    def part_slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t["p_partkey"].cast(pa.int64()),
                "p_brand": t["p_brand"],
                "p_type": t["p_type"],
            }
        )

    joined = hash_join(
        kept,
        part.map_batches(part_slim, batch_format="pyarrow"),
        ["l_partkey"],
        merge_fn=lambda df: df[
            ["p_brand", "p_type", "l_suppkey"]
        ].drop_duplicates(),
    )

    # (brand, type) co-location implies (brand, type, supplier)
    # co-location -> dedup + distinct-count inside one exchange
    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["p_brand", "p_type", "l_suppkey"])
        return (
            d.groupby(["p_brand", "p_type"], sort=False)["l_suppkey"]
            .nunique()
            .reset_index(name="supplier_cnt")
        )

    out = hash_aggregate(joined, ["p_brand", "p_type"], cnt)
    df = collect_sorted(out, ["p_brand", "p_type"])
    if df.empty or "p_brand" not in df.columns:
        return pd.DataFrame(
            {
                "p_brand": pd.Series(dtype=object),
                "p_type": pd.Series(dtype=object),
                "supplier_cnt": pd.Series(dtype=np.int64),
            }
        )
    df["supplier_cnt"] = df["supplier_cnt"].astype(np.int64)
    return df[["p_brand", "p_type", "supplier_cnt"]]


SQL_BRAND_SUPPLIER_COUNTS = """
SELECT p_brand, p_type,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
GROUP BY p_brand, p_type
ORDER BY p_brand, p_type
"""

ORACLE_QUERIES["brand_supplier_counts"] = (
    q_brand_supplier_counts,
    SQL_BRAND_SUPPLIER_COUNTS,
)
