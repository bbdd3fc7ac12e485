"""Wave-36: storage-partitioned sort-merge join + automatic skew join.

Two join-execution strategies the 100-TB playbook still lacked as
first-class, oracle-certified operators:

``sorted_join_priority`` — the Iceberg/Delta storage-partitioned join
(:func:`pynomaly_ray.sources.sorted_layout.sorted_merge_join`): orders
and customer each pay ONE range_sort at write time (the persisted
sorted layout), after which the join moves zero rows — one task per
left file reads only the right files whose zone ranges overlap its
own.  The in-query assertion pins the property that makes it worth
persisting: the merge plan is near-diagonal, never the all-pairs
file cross product.

``skew_join_events`` — hash_join's docstring tells callers to salt hot
keys by hand; :func:`pynomaly_ray.functions.exchange.skew_join`
automates it (per-block top-k detection -> salt only provably-hot
keys -> one (key, salt) exchange).  events.user_id is genuinely
low-cardinality here (every key hot at the query's threshold), so the
gate data exercises the full salted path — detection, left salting,
right replication — against the plain unsalted SQL twin.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    collect_sorted,
    hash_aggregate,
    skew_join,
)
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _cents, _pq


# ---------------------------------------------------------------------------
# Q: sorted_join_priority — revenue by (mktsegment, orderpriority)
# through two persisted SORTED layouts joined with zero shuffle.
# ---------------------------------------------------------------------------
def q_sorted_join_priority(sf_dir: str):
    import shutil
    import tempfile

    from pynomaly_ray.sources.sorted_layout import (
        merge_join_plan,
        sorted_merge_join,
        write_sorted,
    )

    root = tempfile.mkdtemp(prefix="pnr-spj-", dir="/tmp")
    try:
        orders = _pq(
            sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderpriority"]
        )

        def ord_slim(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o_custkey": t["o_custkey"],
                    "o_orderpriority": t["o_orderpriority"],
                    "cents": pa.array(
                        _cents(t["o_totalprice"].to_numpy()), pa.int64()
                    ),
                }
            )

        cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        lp = os.path.join(root, "orders")
        rp = os.path.join(root, "customer")
        # 8 partitions per side so the plan-pruning assertion below is
        # non-vacuous at gate scale (auto fan-out would pick 1)
        write_sorted(
            orders.map_batches(ord_slim, batch_format="pyarrow"),
            "o_custkey",
            lp,
            num_partitions=8,
        )
        write_sorted(cust, "c_custkey", rp, num_partitions=8)

        # the property the layout pays for: near-diagonal alignment,
        # not the all-pairs cross product (both sides sorted on the
        # same key distribution -> each left file overlaps O(1) right
        # files; allow 3x slack for boundary overlaps)
        plan = merge_join_plan(lp, rp)
        n_l = len(plan)
        n_r = max(len(p["rfiles"]) for p in plan) if plan else 0
        total = sum(len(p["rfiles"]) for p in plan)
        if n_l > 1 and total > 3 * max(n_l, 8):
            raise AssertionError(
                f"storage-partitioned join plan degenerated: {total} "
                f"file reads across {n_l} tasks (max {n_r}/task)"
            )

        def per_group(df: pd.DataFrame) -> pd.DataFrame:
            return (
                df.groupby(["c_mktsegment", "o_orderpriority"], sort=False)
                .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"))
                .reset_index()
            )

        joined = sorted_merge_join(lp, rp, merge_fn=per_group)
        out = hash_aggregate(
            joined,
            ["c_mktsegment", "o_orderpriority"],
            lambda df: df.groupby(
                ["c_mktsegment", "o_orderpriority"], sort=False
            )
            .sum()
            .reset_index(),
        )
        df = out.to_pandas()
        df["n_orders"] = df["n_orders"].astype(np.int64)
        df["sum_cents"] = df["sum_cents"].astype(np.int64)
        return collect_sorted(df, ["c_mktsegment", "o_orderpriority"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_SORTED_JOIN_PRIORITY = """
SELECT c_mktsegment,
       o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderpriority
ORDER BY c_mktsegment, o_orderpriority
"""


ORACLE_QUERIES["sorted_join_priority"] = (
    q_sorted_join_priority,
    SQL_SORTED_JOIN_PRIORITY,
)


# ---------------------------------------------------------------------------
# Q: skew_join_events — events x customer on user_id = c_custkey via
# the AUTOMATIC skew join.  user_id cardinality is tiny relative to
# event volume, so at hot_threshold=50 detection marks (essentially)
# every user hot and the whole fact table takes the salted path; the
# SQL twin is the plain unsalted join, so the hash match certifies
# that salting + replication changed the execution and nothing else.
# ---------------------------------------------------------------------------
def q_skew_join_events(sf_dir: str):
    ev = _pq(sf_dir, "events", ["user_id", "value"])

    def ev_slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "val_cents": pa.array(
                    _cents(t["value"].to_numpy()), pa.int64()
                ),
            }
        )

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def cust_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["c_custkey"].cast(pa.int64()),
                "c_mktsegment": t["c_mktsegment"],
            }
        )

    def per_segment(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("c_mktsegment", sort=False)
            .agg(n_events=("val_cents", "size"), sum_cents=("val_cents", "sum"))
            .reset_index()
        )

    joined = skew_join(
        ev.map_batches(ev_slim, batch_format="pyarrow"),
        cust.map_batches(cust_keyed, batch_format="pyarrow"),
        "user_id",
        merge_fn=per_segment,
        hot_threshold=50,
        num_salts=8,
    )
    out = hash_aggregate(
        joined,
        ["c_mktsegment"],
        lambda df: df.groupby("c_mktsegment", sort=False)
        .sum()
        .reset_index(),
    )
    df = out.to_pandas()
    df["n_events"] = df["n_events"].astype(np.int64)
    df["sum_cents"] = df["sum_cents"].astype(np.int64)
    return collect_sorted(df, ["c_mktsegment"])


SQL_SKEW_JOIN_EVENTS = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


ORACLE_QUERIES["skew_join_events"] = (q_skew_join_events, SQL_SKEW_JOIN_EVENTS)
