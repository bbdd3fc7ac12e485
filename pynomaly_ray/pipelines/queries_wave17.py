"""Wave-17 query pipelines: classic multi-join analytics shapes the
suite did not yet cover, plus distributed graph and ML staples.

- ``local_supplier_volume`` — TPC-H Q5 shape: a three-exchange join
  pipeline (customer x orders, x lineitem, x supplier) with the
  same-nation correlation predicate evaluated inside the final join's
  bucket reducer, dims (nation x region) broadcast from the driver.
- ``product_profit`` — TPC-H Q9 shape: part-filtered lineitem joined
  to supplier nation and order year; every join collapses its output
  with a merge_fn partial so no exchange ships wider rows than needed.
- ``order_count_distribution`` — TPC-H Q13 shape: LEFT join with the
  filter on the join (not WHERE), two-level aggregate where the second
  level's domain (orders-per-customer) is tiny and driver-combined.
- ``triangle_count`` — distributed triangle enumeration on a derived
  graph: orient edges low->high, wedge-generate by apex via a
  self-hash-join, close wedges against the edge set with a two-key
  hash join.  The graph is synthesized from orders via the knuth32
  hash (SQL-twin exact) over a vertex domain that scales with the
  data (|V| = |orders|/15) so edge density — and therefore wedge
  volume per vertex — is constant at every scale factor.
- ``pca_project`` — distributed PCA (rows-only): one pass of exact
  integer-scaled (e6) sufficient statistics (n, sum, Gram) so the
  covariance is bit-deterministic regardless of batch partitioning,
  driver-side eigh on the tiny d x d matrix with sign-canonicalized
  components, then a second streaming pass projecting every vector.

All SQL-checked entries keep exact integer value surfaces
(cents / e6) so the driver's value-hash comparison is
reduction-order-independent.
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
from pynomaly_ray.pipelines.queries import (
    ORACLE_QUERIES,
    _cents,
    _pq,
    _ROWS_PER_BLOCK,
)


def _blocks_for(path: str) -> int:
    import pyarrow.parquet as papq

    rows = papq.read_metadata(path).num_rows
    return max(1, min(64, rows // _ROWS_PER_BLOCK + 1))


# ---------------------------------------------------------------------------
# Q: local_supplier_volume — TPC-H Q5 shape.  Revenue per nation from
# lineitems whose CUSTOMER and SUPPLIER share that nation, nations
# restricted to one region, orders to a date window.  Three exchanges:
# customer x orders on custkey, x lineitem on orderkey, x supplier on
# suppkey — the same-nation predicate and the final collapse both run
# inside the last join's bucket reducers, so nothing wider than
# (suppkey, nationkey, cents) ever crosses the wire after join 2.
# nation x region stay driver-side (25 x 5 rows, genuinely constant).
# ---------------------------------------------------------------------------
def q_local_supplier_volume(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads
    import pyarrow.parquet as papq

    from pynomaly_ray.sources.parquet import read_parquet_clean

    nat = papq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = papq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    ).to_pandas()
    asia_rk = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(asia_rk)]
    asia_keys = nat["n_nationkey"].to_numpy(np.int64)
    name_of = dict(
        zip(nat["n_nationkey"].astype(np.int64), nat["n_name"].astype(str))
    )
    key_set = pa.array(asia_keys, pa.int64())

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def cust_slim(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nk = t["c_nationkey"].cast(pa.int64())
        keep = pc.is_in(nk, value_set=key_set)
        t = t.filter(keep)
        return pa.table(
            {
                "c_custkey": t["c_custkey"].cast(pa.int64()),
                "c_nationkey": t["c_nationkey"].cast(pa.int64()),
            }
        )

    lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1998, 1, 1)
    ord_path = os.path.join(sf_dir, "orders.parquet")
    orders = read_parquet_clean(
        ord_path,
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi),
        override_num_blocks=_blocks_for(ord_path),
    )

    def ord_slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["o_custkey"].cast(pa.int64()),
                "l_orderkey": t["o_orderkey"].cast(pa.int64()),
            }
        )

    def co_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df[["l_orderkey", "c_nationkey"]]

    co = hash_join(
        cust.map_batches(cust_slim, batch_format="pyarrow"),
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        ["c_custkey"],
        merge_fn=co_merge,
    )

    li = _pq(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_slim(t: pa.Table) -> pa.Table:
        rev = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].cast(pa.int64()),
                "l_suppkey": t["l_suppkey"].cast(pa.int64()),
                "rev_cents": pa.array(rev),
            }
        )

    def lo_merge(df: pd.DataFrame) -> pd.DataFrame:
        # collapse per (supplier, customer-nation) inside the bucket
        return (
            df.groupby(["l_suppkey", "c_nationkey"], sort=False)["rev_cents"]
            .sum()
            .reset_index()
        )

    j2 = hash_join(
        li.map_batches(li_slim, batch_format="pyarrow"),
        co,
        ["l_orderkey"],
        merge_fn=lo_merge,
    )

    sup = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def sup_slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_suppkey": t["s_suppkey"].cast(pa.int64()),
                "s_nationkey": t["s_nationkey"].cast(pa.int64()),
            }
        )

    def final_merge(df: pd.DataFrame) -> pd.DataFrame:
        # the Q5 correlation: customer nation == supplier nation
        df = df[df["c_nationkey"] == df["s_nationkey"]]
        return (
            df.groupby("s_nationkey", sort=False)["rev_cents"]
            .sum()
            .reset_index()
        )

    j3 = hash_join(
        j2,
        sup.map_batches(sup_slim, batch_format="pyarrow"),
        ["l_suppkey"],
        merge_fn=final_merge,
    )
    df = j3.to_pandas()
    if df.empty or "s_nationkey" not in df.columns:
        return pd.DataFrame(
            {
                "n_name": pd.Series(dtype=object),
                "revenue_cents": pd.Series(dtype=np.int64),
            }
        )
    out = (
        df.groupby("s_nationkey", sort=False)["rev_cents"]
        .sum()
        .reset_index(name="revenue_cents")
    )
    out["n_name"] = out["s_nationkey"].map(name_of).astype(object)
    out = out[["n_name", "revenue_cents"]]
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return out.sort_values("n_name", kind="mergesort").reset_index(drop=True)


SQL_LOCAL_SUPPLIER_VOLUME = """
WITH rn AS (
  SELECT n_nationkey, n_name
  FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
SELECT n_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN rn       ON s_nationkey = rn.n_nationkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY n_name
ORDER BY n_name
"""

ORACLE_QUERIES["local_supplier_volume"] = (
    q_local_supplier_volume,
    SQL_LOCAL_SUPPLIER_VOLUME,
)


# ---------------------------------------------------------------------------
# Q: product_profit — TPC-H Q9 shape: profit (revenue, no supplycost
# column in this schema) per supplier nation per order year for parts
# whose name matches a pattern.  Joins collapse progressively: part
# filter first (smallest surviving set), supplier nation attached,
# order year last, each merge_fn shrinking the bucket output.
# ---------------------------------------------------------------------------
def q_product_profit(sf_dir: str):
    import pyarrow.parquet as papq

    nat = papq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    name_of = dict(
        zip(nat["n_nationkey"].astype(np.int64), nat["n_name"].astype(str))
    )

    part = _pq(sf_dir, "part", ["p_partkey", "p_name"])

    def part_slim(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.match_substring(t["p_name"], "red")
        t = t.filter(keep)
        return pa.table({"l_partkey": t["p_partkey"].cast(pa.int64())})

    li = _pq(
        sf_dir,
        "lineitem",
        [
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def li_slim(t: pa.Table) -> pa.Table:
        rev = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].cast(pa.int64()),
                "l_partkey": t["l_partkey"].cast(pa.int64()),
                "l_suppkey": t["l_suppkey"].cast(pa.int64()),
                "rev_cents": pa.array(rev),
            }
        )

    j1 = hash_join(
        li.map_batches(li_slim, batch_format="pyarrow"),
        part.map_batches(part_slim, batch_format="pyarrow"),
        ["l_partkey"],
        merge_fn=lambda df: df[["l_orderkey", "l_suppkey", "rev_cents"]],
    )

    sup = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def sup_slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_suppkey": t["s_suppkey"].cast(pa.int64()),
                "s_nationkey": t["s_nationkey"].cast(pa.int64()),
            }
        )

    def j2_merge(df: pd.DataFrame) -> pd.DataFrame:
        # pre-collapse per (order, nation): orderkeys repeat across
        # lineitems, so this shrinks before the orders exchange
        return (
            df.groupby(["l_orderkey", "s_nationkey"], sort=False)["rev_cents"]
            .sum()
            .reset_index()
        )

    j2 = hash_join(
        j1,
        sup.map_batches(sup_slim, batch_format="pyarrow"),
        ["l_suppkey"],
        merge_fn=j2_merge,
    )

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def ord_slim(t: pa.Table) -> pa.Table:
        dt = (
            t["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "l_orderkey": t["o_orderkey"].cast(pa.int64()),
                "o_year": pa.array(dt),
            }
        )

    def j3_merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["s_nationkey", "o_year"], sort=False)["rev_cents"]
            .sum()
            .reset_index()
        )

    j3 = hash_join(
        j2,
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        ["l_orderkey"],
        merge_fn=j3_merge,
    )
    df = j3.to_pandas()
    if df.empty or "s_nationkey" not in df.columns:
        return pd.DataFrame(
            {
                "n_name": pd.Series(dtype=object),
                "o_year": pd.Series(dtype=np.int64),
                "profit_cents": pd.Series(dtype=np.int64),
            }
        )
    out = (
        df.groupby(["s_nationkey", "o_year"], sort=False)["rev_cents"]
        .sum()
        .reset_index(name="profit_cents")
    )
    out["n_name"] = out["s_nationkey"].map(name_of).astype(object)
    out = out[["n_name", "o_year", "profit_cents"]]
    out["o_year"] = out["o_year"].astype(np.int64)
    out["profit_cents"] = out["profit_cents"].astype(np.int64)
    return out.sort_values(
        ["n_name", "o_year"], kind="mergesort"
    ).reset_index(drop=True)


SQL_PRODUCT_PROFIT = """
SELECT n_name,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year
"""

ORACLE_QUERIES["product_profit"] = (q_product_profit, SQL_PRODUCT_PROFIT)


# ---------------------------------------------------------------------------
# Q: order_count_distribution — TPC-H Q13 shape: how many customers
# placed exactly k (non-urgent) orders, INCLUDING k=0 — the filter
# lives on the join, not the WHERE, so zero-order customers survive
# the LEFT join.  Engine: per-customer counts via one exchange, LEFT
# hash join against the customer roll, second-level aggregate folded
# inside the join's bucket reducers (its domain — orders per customer
# — is tiny, so p buckets x ~50 rows driver-combine for free).
# ---------------------------------------------------------------------------
def q_order_count_distribution(sf_dir: str):
    import pyarrow.dataset as pads

    from pynomaly_ray.sources.parquet import read_parquet_clean

    ord_path = os.path.join(sf_dir, "orders.parquet")
    orders = read_parquet_clean(
        ord_path,
        columns=["o_custkey", "o_orderpriority"],
        filter=pads.field("o_orderpriority") != "1-URGENT",
        override_num_blocks=_blocks_for(ord_path),
    )

    def cnt_partial(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, counts = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "c_custkey": pa.array(keys),
                "cnt": pa.array(counts.astype(np.int64)),
            }
        )

    counts = hash_aggregate(
        orders.map_batches(cnt_partial, batch_format="pyarrow"),
        ["c_custkey"],
        lambda df: df.groupby("c_custkey", sort=False)["cnt"]
        .sum()
        .reset_index(),
    )

    cust = _pq(sf_dir, "customer", ["c_custkey"])

    def cust_slim(t: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": t["c_custkey"].cast(pa.int64())})

    def dist_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cnt"].fillna(0).astype(np.int64)
        keys, counts = np.unique(c.to_numpy(), return_counts=True)
        return pd.DataFrame(
            {"c_count": keys, "custdist": counts.astype(np.int64)}
        )

    j = hash_join(
        cust.map_batches(cust_slim, batch_format="pyarrow"),
        counts,
        ["c_custkey"],
        how="left",
        merge_fn=dist_partial,
    )
    df = j.to_pandas()
    if df.empty or "c_count" not in df.columns:
        return pd.DataFrame(
            {
                "c_count": pd.Series(dtype=np.int64),
                "custdist": pd.Series(dtype=np.int64),
            }
        )
    out = (
        df.groupby("c_count", sort=False)["custdist"].sum().reset_index()
    )
    out["c_count"] = out["c_count"].astype(np.int64)
    out["custdist"] = out["custdist"].astype(np.int64)
    return out.sort_values("c_count", kind="mergesort").reset_index(drop=True)


SQL_ORDER_COUNT_DISTRIBUTION = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY c_count
"""

ORACLE_QUERIES["order_count_distribution"] = (
    q_order_count_distribution,
    SQL_ORDER_COUNT_DISTRIBUTION,
)


# ---------------------------------------------------------------------------
# Q: triangle_count — distributed triangle enumeration, the canonical
# "joins as graph compute" shape.  Edges are oriented low->high so each
# triangle {a<b<c} is found exactly once as wedge (b,c) at apex a
# closed by edge (b,c).  Pipeline: distinct edges via one exchange,
# wedge generation via a SELF hash-join on the apex (bucket reducer
# filters v<w so only ordered wedges ship), closure via a TWO-KEY hash
# join of wedges against the edge set, per-apex counts collapsed in the
# closing join's reducers.  Per-vertex wedge volume is deg^2 — the
# vertex domain scales with the data (|V| = |orders| / 15, computed
# identically in SQL) so expected degree, and with it the wedge
# blow-up factor, stays constant at every scale.  Skew note: a hot
# apex bounds one bucket's work at deg_max^2; cap or sample apexes
# above a degree threshold before wedge generation when degree is
# unbounded (not needed for the hash-derived graph, degrees are
# Poisson-concentrated).
# ---------------------------------------------------------------------------
def q_triangle_count(sf_dir: str):
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

    def tri_merge(df: pd.DataFrame) -> pd.DataFrame:
        keys, counts = np.unique(
            df["apex"].to_numpy(np.int64), return_counts=True
        )
        return pd.DataFrame(
            {"node": keys, "tri_cnt": counts.astype(np.int64)}
        )

    tri = hash_join(
        wedges,
        edges.map_batches(close_edges, batch_format="pyarrow"),
        ["v", "w"],
        merge_fn=tri_merge,
    )
    df = tri.to_pandas()
    if df.empty or "node" not in df.columns:
        return pd.DataFrame(
            {
                "node": pd.Series(dtype=np.int64),
                "tri_cnt": pd.Series(dtype=np.int64),
            }
        )
    out = df.groupby("node", sort=False)["tri_cnt"].sum().reset_index()
    out["node"] = out["node"].astype(np.int64)
    out["tri_cnt"] = out["tri_cnt"].astype(np.int64)
    return out.sort_values("node", kind="mergesort").reset_index(drop=True)


SQL_TRIANGLE_COUNT = """
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
)
SELECT e1.u AS node, CAST(COUNT(*) AS BIGINT) AS tri_cnt
FROM e e1
JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
GROUP BY e1.u
ORDER BY node
"""

ORACLE_QUERIES["triangle_count"] = (q_triangle_count, SQL_TRIANGLE_COUNT)


# ---------------------------------------------------------------------------
# Q: pca_project — distributed PCA over the embedding column
# (rows-only: eigendecomposition has no SQL twin).  Pass 1 computes
# EXACT integer sufficient statistics (n, e6-scaled sum, e12-scaled
# Gram) per batch — int64 sums are associative, so the covariance the
# driver assembles is bit-identical regardless of block layout, actor
# scheduling, or scale.  The driver eigh-decomposes the tiny d x d
# covariance (d=64), canonicalizes each component's sign (largest-
# magnitude coordinate positive — eigenvectors are sign-ambiguous),
# and pass 2 streams every vector through the fixed projection,
# emitting e6-scaled int64 coordinates.  Nothing driver-side ever
# scales with the corpus: stats are d^2, projections stay distributed
# until the final (test-sized) collect.
# ---------------------------------------------------------------------------
def q_pca_project(sf_dir: str, n_components: int = 2):
    from pynomaly_ray.stages.similarity import _embedding_matrix

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()

    def stats_partial(batch: pa.Table) -> pa.Table:
        md = _embedding_matrix(batch)
        if md.size == 0:
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "s_e6": pa.array([], pa.list_(pa.int64())),
                    "g_e12": pa.array([], pa.list_(pa.int64())),
                }
            )
        e6 = np.floor(md.astype(np.float64) * 1_000_000.0 + 0.5).astype(
            np.int64
        )
        # chunked exact GEMM: |e6| < 2^31 so chunk dot products stay
        # exact in float64 before the int64 cast (embedding_gram's
        # bound), then int64 accumulation is overflow-safe at 8192 rows
        g = np.zeros((e6.shape[1], e6.shape[1]), dtype=np.int64)
        for s in range(0, e6.shape[0], 8192):
            c = e6[s : s + 8192].astype(np.float64)
            g += (c.T @ c).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([e6.shape[0]], pa.int64()),
                "s_e6": pa.array([e6.sum(axis=0).tolist()]),
                "g_e12": pa.array([g.reshape(-1).tolist()]),
            }
        )

    parts = ds.map_batches(
        stats_partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {
                "vec_id": pd.Series(dtype=np.int64),
                **{
                    f"pc{i + 1}_e6": pd.Series(dtype=np.int64)
                    for i in range(n_components)
                },
            }
        )
    n = int(parts["n"].sum())
    s = np.sum(np.stack(parts["s_e6"].to_numpy()), axis=0).astype(np.float64)
    d = s.shape[0]
    g = np.sum(np.stack(parts["g_e12"].to_numpy()), axis=0).reshape(d, d)
    mu = s / n / 1e6
    cov = g.astype(np.float64) / 1e12 / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    comp = vecs[:, ::-1][:, :n_components]  # descending eigenvalue order
    for j in range(comp.shape[1]):
        k = int(np.argmax(np.abs(comp[:, j])))
        if comp[k, j] < 0:
            comp[:, j] = -comp[:, j]

    def project(batch: pa.Table) -> pa.Table:
        md = _embedding_matrix(batch)
        cols = {
            "vec_id": batch["vec_id"].cast(pa.int64()),
        }
        if md.size == 0:
            for i in range(n_components):
                cols[f"pc{i + 1}_e6"] = pa.array([], pa.int64())
            return pa.table(cols)
        proj = (md.astype(np.float64) - mu) @ comp
        pe6 = np.floor(proj * 1_000_000.0 + 0.5).astype(np.int64)
        for i in range(n_components):
            cols[f"pc{i + 1}_e6"] = pa.array(pe6[:, i])
        return pa.table(cols)

    out = ds.map_batches(project, batch_format="pyarrow")
    return collect_sorted(out, ["vec_id"])
