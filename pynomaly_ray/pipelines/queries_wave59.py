"""Wave-59: co-activity graph projection and exact Gini dispersion.

``coactive_pairs`` — bipartite projection over TIME instead of orders
(the suite's basket ops project the order-part graph; this projects
hour-user): the 10 user pairs sharing the most active hours.  Engine
shape: distinct (hour, user) pairs shrink map-side; an hour-keyed
exchange emits each hour's C(actives, 2) canonical pairs with one
vectorized self-merge; a pair-keyed partial-sum exchange and a k=10
top-k finish.  Skew note: a viral hour fans out quadratically inside
one bucket — the same star-cap prescription as the dedup buckets
applies at crawl scale.

``gini_dispersion`` — Gini mean difference per event type, EXACT:
sum_{i,j} |x_i - x_j| folds to sum_i (2i - n + 1) * x_(i) over the
sorted values (tie order cannot change the sum — equal values swap
equal coefficients), so one sort + one dot product per bucket replaces
the quadratic pairwise scan, all on the cents grid.  The
robust-dispersion complement to the suite's MAD/winsorized family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    collect_sorted,
    hash_aggregate,
    topk,
)
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq

_HOUR_US = 3_600_000_000
_COACTIVE_K = 10


def q_coactive_pairs(sf_dir: str):
    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        hour = df["ts"].astype("int64").to_numpy() // _HOUR_US
        d = pd.DataFrame(
            {"hour": hour, "user_id": df["user_id"].to_numpy(np.int64)}
        ).drop_duplicates()
        return _from_pandas(d)

    def hour_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "pk": pd.Series(dtype=np.int64),
                    "cnt": pd.Series(dtype=np.int64),
                }
            )
        d = df.drop_duplicates()
        m = d.merge(d, on="hour", suffixes=("_1", "_2"))
        a = m["user_id_1"].to_numpy(np.int64)
        b = m["user_id_2"].to_numpy(np.int64)
        keep = a < b
        # packed pair key: one int64 instead of two object-keyed columns
        # (halves the exchange bytes; u1-major order == (u1, u2) order)
        pk = (a[keep] << np.int64(32)) | b[keep]
        keys, cnts = np.unique(pk, return_counts=True)
        return pd.DataFrame(
            {"pk": keys, "cnt": cnts.astype(np.int64)}
        )

    # the hour exchange's INPUT is tiny (distinct hour-user rows) but
    # its reducer expands quadratically — size-adaptive fan-out would
    # collapse to one bucket and serialize the expansion, so the
    # partition count is pinned to the pool width here
    per_pair = hash_aggregate(
        hash_aggregate(
            ds.map_batches(pre, batch_format="pyarrow"),
            ["hour"],
            hour_pairs,
            num_partitions=32,
        ),
        ["pk"],
        lambda df: df.groupby("pk", sort=False)["cnt"].sum().reset_index(),
    )
    # (cnt DESC, pk ASC) == (cnt DESC, u1 ASC, u2 ASC): u1 rides the
    # high bits of the packed key
    out = topk(per_pair, ["cnt", "pk"], _COACTIVE_K, descending=[True, False])
    pk = out["pk"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "u1": pk >> np.int64(32),
            "u2": pk & np.int64(0xFFFFFFFF),
            "cnt": out["cnt"].to_numpy(np.int64),
        }
    )
    return out[["u1", "u2", "cnt"]]


SQL_COACTIVE_PAIRS = f"""
WITH d AS (
  SELECT DISTINCT epoch_us(ts) // {_HOUR_US} AS hour, user_id
  FROM events
)
SELECT a.user_id AS u1, b.user_id AS u2,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM d a JOIN d b ON a.hour = b.hour AND a.user_id < b.user_id
GROUP BY u1, u2
ORDER BY cnt DESC, u1, u2
LIMIT {_COACTIVE_K}
"""


def q_gini_dispersion(sf_dir: str):
    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["value"].notna()]
        cents = np.floor(
            df.pop("value").to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return _from_pandas(
            pd.DataFrame(
                {"event_type": df["event_type"].to_numpy(object), "cents": cents}
            )
        )

    def gini(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype=object),
                    "gini_num": pd.Series(dtype=np.int64),
                    "n": pd.Series(dtype=np.int64),
                }
            )
        rows = []
        d = df.sort_values(["event_type", "cents"], kind="mergesort")
        for et, g in d.groupby("event_type", sort=False):
            x = g["cents"].to_numpy(np.int64)
            n = len(x)
            coef = 2 * np.arange(n, dtype=np.int64) - n + 1
            rows.append((et, int((coef * x).sum()), n))
        return pd.DataFrame(rows, columns=["event_type", "gini_num", "n"])

    out = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"), ["event_type"], gini
    )
    df = collect_sorted(out, ["event_type"])
    df["gini_num"] = df["gini_num"].astype(np.int64)
    df["n"] = df["n"].astype(np.int64)
    return df[["event_type", "gini_num", "n"]]


SQL_GINI_DISPERSION = """
WITH e AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY cents
         ) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e
)
SELECT event_type,
       CAST(SUM((2 * rn - n - 1) * cents) AS BIGINT) AS gini_num,
       CAST(MAX(n) AS BIGINT) AS n
FROM r GROUP BY event_type ORDER BY event_type
"""


ORACLE_QUERIES["coactive_pairs"] = (q_coactive_pairs, SQL_COACTIVE_PAIRS)
ORACLE_QUERIES["gini_dispersion"] = (
    q_gini_dispersion,
    SQL_GINI_DISPERSION,
)
