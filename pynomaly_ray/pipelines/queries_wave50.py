"""Wave-50: SCD2 interval construction and exact weighted medians —
two warehouse-dimension operators certified against DuckDB twins.

``scd2_intervals`` — slowly-changing-dimension type-2 history build:
each user's event_type stream collapses into validity intervals
[valid_from, valid_to) — consecutive same-type events merge into one
version, the next version's start closes the previous one, and the
open tail carries a fixed +inf sentinel (2^62) so no NULL enters the
hash surface.  This is THE dimension-table construction op of every
warehouse load (change stream -> versioned rows).  One keyed exchange;
run-length collapse + shifted closes are two vectorized passes per
bucket.  Reference anchor: the stream scorer keeps the LAST fitted
state per partition (reference/PyNomaly/loop.py:993-1046) — SCD2 is
the same latest-version-per-key shape with full history retained.

``weighted_median_price`` — exact quantity-weighted median of the
price-cents distribution per return flag: the smallest price v whose
cumulative quantity reaches half the total (ties to the lower value,
the classical lower weighted median).  Integer-exact end to end:
cents grid for prices, quantities are integral in this corpus, and
the half-total comparison is doubled instead of divided
(2*cum >= total).  Per-flag exchange, one sort + cumsum per bucket —
the weighted extension of the suite's unweighted median family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted, hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq

_OPEN_END_US = 1 << 62  # open-interval sentinel (both sides)


def q_scd2_intervals(sf_dir: str):
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["ts_us"] = df.pop("ts").astype("int64")
        return _from_pandas(df)

    def versions(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype=np.int64),
                    "event_type": pd.Series(dtype=object),
                    "valid_from_us": pd.Series(dtype=np.int64),
                    "valid_to_us": pd.Series(dtype=np.int64),
                }
            )
        d = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy(np.int64)
        et = d["event_type"].to_numpy(object)
        ts = d["ts_us"].to_numpy(np.int64)
        # run starts: first event of a user or a type change
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        type_change = np.r_[True, et[1:] != et[:-1]]
        change = new_user | type_change
        starts = np.nonzero(change)[0]
        v_from = ts[starts]
        v_user = uid[starts]
        v_type = et[starts]
        # a version closes when the NEXT version of the same user starts
        nxt_from = np.r_[v_from[1:], np.int64(_OPEN_END_US)]
        nxt_user = np.r_[v_user[1:], np.int64(-1)]
        v_to = np.where(nxt_user == v_user, nxt_from, np.int64(_OPEN_END_US))
        return pd.DataFrame(
            {
                "user_id": v_user,
                "event_type": v_type,
                "valid_from_us": v_from,
                "valid_to_us": v_to,
            }
        )

    out = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"), ["user_id"], versions
    )
    df = collect_sorted(out, ["user_id", "valid_from_us", "event_type"])
    for c in ("user_id", "valid_from_us", "valid_to_us"):
        df[c] = df[c].astype(np.int64)
    return df[["user_id", "event_type", "valid_from_us", "valid_to_us"]]


SQL_SCD2_INTERVALS = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev
  FROM events
),
v AS (
  SELECT user_id, event_type, ts_us AS valid_from_us
  FROM e WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, valid_from_us,
       COALESCE(LEAD(valid_from_us) OVER (
         PARTITION BY user_id ORDER BY valid_from_us
       ), CAST({_OPEN_END_US} AS BIGINT)) AS valid_to_us
FROM v
ORDER BY user_id, valid_from_us, event_type
"""


def q_weighted_median_price(sf_dir: str):
    ds = _pq(
        sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"]
    )

    def pre(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "l_returnflag": t["l_returnflag"].to_pandas(),
                    "cents": cents,
                    "qty": qty,
                }
            )
            .groupby(["l_returnflag", "cents"], sort=False)["qty"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def wmedian(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "l_returnflag": pd.Series(dtype=object),
                    "w_median_cents": pd.Series(dtype=np.int64),
                    "total_qty": pd.Series(dtype=np.int64),
                }
            )
        d = (
            df.groupby(["l_returnflag", "cents"], sort=False)["qty"]
            .sum()
            .reset_index()
            .sort_values(["l_returnflag", "cents"], kind="mergesort")
        )
        rows = []
        for flag, g in d.groupby("l_returnflag", sort=False):
            q = g["qty"].to_numpy(np.int64)
            c = g["cents"].to_numpy(np.int64)
            cum = np.cumsum(q)
            total = cum[-1]
            i = int(np.searchsorted(2 * cum, total, side="left"))
            rows.append((flag, int(c[i]), int(total)))
        return pd.DataFrame(
            rows, columns=["l_returnflag", "w_median_cents", "total_qty"]
        )

    out = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["l_returnflag"],
        wmedian,
    )
    df = collect_sorted(out, ["l_returnflag"])
    df["w_median_cents"] = df["w_median_cents"].astype(np.int64)
    df["total_qty"] = df["total_qty"].astype(np.int64)
    return df[["l_returnflag", "w_median_cents", "total_qty"]]


SQL_WEIGHTED_MEDIAN_PRICE = """
WITH t AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_returnflag, cents
),
w AS (
  SELECT l_returnflag, cents, qty,
         SUM(qty) OVER (
           PARTITION BY l_returnflag ORDER BY cents
         ) AS cum,
         SUM(qty) OVER (PARTITION BY l_returnflag) AS total
  FROM t
)
SELECT l_returnflag,
       CAST(MIN(cents) AS BIGINT) AS w_median_cents,
       CAST(MAX(total) AS BIGINT) AS total_qty
FROM w
WHERE 2 * cum >= total
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


ORACLE_QUERIES["scd2_intervals"] = (q_scd2_intervals, SQL_SCD2_INTERVALS)
ORACLE_QUERIES["weighted_median_price"] = (
    q_weighted_median_price,
    SQL_WEIGHTED_MEDIAN_PRICE,
)
