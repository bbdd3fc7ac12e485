"""Wave-47: data-quality audit operators — the profiling side of the
validation north star (column stats, uniqueness, referential checks
exist since round 1; these add dependency, reconciliation, and drift
audits over the same exchange primitives).

``fd_profile`` — functional-dependency violation profiling (the
Metanome/data-profiling classic): audit the candidate FD
``l_partkey -> l_suppkey`` and report the 10 worst violating
determinant keys by distinct dependent count.  Engine shape: per-block
DISTINCT (det, dep) pair partials (map-side dedup shrinks the exchange
to the pair surface), one keyed exchange counting distinct deps per
det, then a k=10 top-k under the (n_deps DESC, key ASC) total order.

``order_reconciliation`` — cross-table aggregate reconciliation (the
audit every warehouse runs: does the fact-table sum reconcile with the
header total?): per order, cents(SUM(extprice*(1-disc)*(1+tax))) vs
cents(o_totalprice), rolled up per order status as n_orders /
n_mismatch / max_abs_diff_cents.  Map-side per-order partial sums,
one keyed join exchange, integer cents everywhere after the per-line
rounding (same `_cents` grid every revenue oracle in the suite uses).
Orders with no lineitems reconcile against 0 (LEFT JOIN on both
sides).

``profile_drift`` — cheap SQL-exact distribution-drift screen per
source (the LoOP detector's integer-certifiable little sibling): each
source's mean n_chars vs the global mean, flagged when they differ by
more than 10% — compared EXACTLY via cross-multiplication
(10*|sum_s*cnt_g - sum_g*cnt_s| > sum_g*cnt_s) so no division or
float enters the verdict.  One tiny two-level aggregate; the global
row rides along via a broadcast-free second pass over the 20-row
per-source table on the driver (profile rows, not data rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    collect_sorted,
    hash_aggregate,
    hash_join,
    topk,
)
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq

_FD_TOPK = 10
_DRIFT_PCT = 10  # flag when |mean_s - mean_g| > mean_g * _DRIFT_PCT/100


# ---------------------------------------------------------------------------
# fd_profile
# ---------------------------------------------------------------------------


def q_fd_profile(sf_dir: str):
    ds = _pq(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pairs(t: pa.Table) -> pa.Table:
        # composite-int64 unique beats a pandas hashtable dedup ~5x;
        # suppkey is bounded far below 2^32 in any TPC-H-shaped corpus
        part = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        supp = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        comp = np.unique((part << np.int64(32)) | supp)
        return pa.table(
            {
                "l_partkey": pa.array(comp >> np.int64(32), pa.int64()),
                "l_suppkey": pa.array(comp & np.int64(0xFFFFFFFF), pa.int64()),
            }
        )

    def count_deps(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()  # global dedup: all rows of a key co-located
        out = (
            d.groupby("l_partkey", sort=False)["l_suppkey"]
            .nunique()
            .astype(np.int64)
            .reset_index(name="n_deps")
        )
        return out

    deps = hash_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["l_partkey"],
        count_deps,
    )
    out = topk(deps, ["n_deps", "l_partkey"], _FD_TOPK, descending=[True, False])
    for c in ("l_partkey", "n_deps"):
        out[c] = out[c].astype(np.int64)
    return out[["l_partkey", "n_deps"]]


SQL_FD_PROFILE = f"""
SELECT l_partkey, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_deps
FROM lineitem
GROUP BY l_partkey
ORDER BY n_deps DESC, l_partkey
LIMIT {_FD_TOPK}
"""


# ---------------------------------------------------------------------------
# order_reconciliation
# ---------------------------------------------------------------------------


def q_order_reconciliation(sf_dir: str):
    li = _pq(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])

    def line_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        val = (
            df["l_extendedprice"].to_numpy()
            * (1.0 - df["l_discount"].to_numpy())
            * (1.0 + df["l_tax"].to_numpy())
        )
        cents = np.floor(val * 100.0 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame({"o_orderkey": df["l_orderkey"].to_numpy(np.int64), "line_cents": cents})
            .groupby("o_orderkey", sort=False)["line_cents"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def order_pre(t: pa.Table) -> pa.Table:
        tot = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "o_orderstatus": t["o_orderstatus"],
                "total_cents": pa.array(tot, pa.int64()),
            }
        )

    def reconcile(df: pd.DataFrame) -> pd.DataFrame:
        # runs ONCE per join bucket on the bucket's full joined frame
        # (an order's per-block partials all land here; a post-join
        # map_batches could re-slice them across batches)
        if df.empty:
            return pd.DataFrame(
                {
                    "o_orderstatus": pd.Series(dtype=object),
                    "n_orders": pd.Series(dtype=np.int64),
                    "n_mismatch": pd.Series(dtype=np.int64),
                    "max_abs_diff_cents": pd.Series(dtype=np.int64),
                }
            )
        df = df.copy()
        df["line_cents"] = df["line_cents"].fillna(0).astype(np.int64)
        d = (
            df.groupby(
                ["o_orderkey", "o_orderstatus", "total_cents"], sort=False
            )["line_cents"]
            .sum()
            .reset_index()
        )
        diff = (
            d["line_cents"].to_numpy(np.int64)
            - d["total_cents"].to_numpy(np.int64)
        )
        d = d.assign(mism=(diff != 0).astype(np.int64), absdiff=np.abs(diff))
        return (
            d.groupby("o_orderstatus", sort=False)
            .agg(
                n_orders=("mism", "size"),
                n_mismatch=("mism", "sum"),
                max_abs_diff_cents=("absdiff", "max"),
            )
            .reset_index()
        )

    sums = li.map_batches(line_partial, batch_format="pyarrow")
    parts = hash_join(
        orders.map_batches(order_pre, batch_format="pyarrow"),
        sums,
        ["o_orderkey"],
        merge_fn=reconcile,
        how="left",
    )
    out = hash_aggregate(
        parts,
        ["o_orderstatus"],
        lambda df: df.groupby("o_orderstatus", sort=False)
        .agg(
            n_orders=("n_orders", "sum"),
            n_mismatch=("n_mismatch", "sum"),
            max_abs_diff_cents=("max_abs_diff_cents", "max"),
        )
        .reset_index(),
    )
    res = collect_sorted(out, ["o_orderstatus"])
    for c in ("n_orders", "n_mismatch", "max_abs_diff_cents"):
        res[c] = res[c].astype(np.int64)
    return res[["o_orderstatus", "n_orders", "n_mismatch", "max_abs_diff_cents"]]


SQL_ORDER_RECONCILIATION = """
WITH s AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
              * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o_orderstatus,
         COALESCE(s.cents, 0)
           - CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS diff
  FROM orders LEFT JOIN s ON o_orderkey = s.l_orderkey
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN diff <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mismatch,
       CAST(MAX(ABS(diff)) AS BIGINT) AS max_abs_diff_cents
FROM j GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# profile_drift
# ---------------------------------------------------------------------------


def q_profile_drift(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            df.groupby("source", sort=False)["n_chars"]
            .agg(cnt="size", total="sum")
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    per_source = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"],
        lambda df: df.groupby("source", sort=False)
        .agg(cnt=("cnt", "sum"), total=("total", "sum"))
        .reset_index(),
    ).to_pandas()  # profile rows (one per source), not data rows
    g_cnt = int(per_source["cnt"].sum())
    g_tot = int(per_source["total"].sum())
    cnt = per_source["cnt"].to_numpy(np.int64)
    tot = per_source["total"].to_numpy(np.int64)
    # |mean_s - mean_g| > mean_g/10  <=>  10*|tot*g_cnt - g_tot*cnt| > g_tot*cnt
    lhs = _DRIFT_PCT * np.abs(tot * g_cnt - g_tot * cnt)
    flag = (lhs > g_tot * cnt).astype(np.int64)
    out = pd.DataFrame(
        {
            "source": per_source["source"],
            "cnt": cnt,
            "total_chars": tot,
            "drifted": flag,
        }
    ).sort_values("source", kind="mergesort").reset_index(drop=True)
    return out


SQL_PROFILE_DRIFT = f"""
WITH s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY source
),
g AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS g_cnt,
         CAST(SUM(total_chars) AS BIGINT) AS g_tot
  FROM s
)
SELECT s.source, s.cnt, s.total_chars,
       CAST(CASE WHEN {_DRIFT_PCT} * ABS(s.total_chars * g.g_cnt
                      - g.g_tot * s.cnt) > g.g_tot * s.cnt
            THEN 1 ELSE 0 END AS BIGINT) AS drifted
FROM s CROSS JOIN g
ORDER BY s.source
"""


ORACLE_QUERIES["fd_profile"] = (q_fd_profile, SQL_FD_PROFILE)
ORACLE_QUERIES["order_reconciliation"] = (
    q_order_reconciliation,
    SQL_ORDER_RECONCILIATION,
)
ORACLE_QUERIES["profile_drift"] = (q_profile_drift, SQL_PROFILE_DRIFT)
