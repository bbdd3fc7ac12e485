"""Wave-20 pipelines: sequential per-key recurrences done distributed.

- ``ewma_user_values`` — exponentially-weighted moving average of each
  user's event values, as an INTEGER recurrence
  ``y_t = (15*x_t + 85*y_{t-1}) // 100`` over cents so the result is
  bit-exact against a DuckDB RECURSIVE-CTE twin.  A recurrence cannot
  be prefix-scanned, but it CAN be vectorized ACROSS KEYS: the bucket
  reducer walks time steps (bounded by the longest per-user sequence),
  each step one numpy operation over every user in the bucket — the
  same "iterate steps, vectorize the population" trick as pointer
  jumping, here certified value-exactly.  100-TB note: step count is
  the per-key sequence length, not the corpus size; skewed users bound
  one bucket's step loop, not the cluster.
- ``longest_streak`` — gaps-and-islands: each user's longest run of
  consecutive active days.  The island id (``day - rank-within-user``)
  is constant within a run, so one sorted groupby per bucket resolves
  every run without any per-row Python; SQL twin uses the classic
  ROW_NUMBER difference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted, hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _cents, _pq


def q_ewma_user_values(sf_dir: str):
    ev = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"].cast(pa.int64()),
                "ts": t["ts"],
                "event_id": t["event_id"].cast(pa.int64()),
                "x": pa.array(
                    _cents(t["value"].to_numpy(zero_copy_only=False))
                ),
            }
        )

    def ewma_reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["user_id"])
        if df.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype=np.int64),
                    "n_events": pd.Series(dtype=np.int64),
                    "ewma_cents": pd.Series(dtype=np.int64),
                }
            )
        df = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        uid = df["user_id"].to_numpy(np.int64)
        x = df["x"].to_numpy(np.int64)
        # per-user offsets in the (user, time)-sorted frame
        starts = np.flatnonzero(
            np.concatenate([[True], uid[1:] != uid[:-1]])
        )
        lens = np.diff(np.concatenate([starts, [len(uid)]]))
        y = x[starts].copy()  # y_1 = x_1
        for t in range(1, int(lens.max())):
            active = lens > t
            idx = starts[active] + t
            y[active] = (15 * x[idx] + 85 * y[active]) // 100
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": lens.astype(np.int64),
                "ewma_cents": y.astype(np.int64),
            }
        )

    out = hash_aggregate(
        ev.map_batches(slim, batch_format="pyarrow"),
        ["user_id"],
        ewma_reduce,
    )
    df = collect_sorted(out, ["user_id"])
    if df.empty or "user_id" not in df.columns:
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "n_events": pd.Series(dtype=np.int64),
                "ewma_cents": pd.Series(dtype=np.int64),
            }
        )
    for c in ("user_id", "n_events", "ewma_cents"):
        df[c] = df[c].astype(np.int64)
    return df[["user_id", "n_events", "ewma_cents"]]


SQL_EWMA_USER_VALUES = """
WITH RECURSIVE s AS (
  SELECT user_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS i
  FROM events
  WHERE user_id IS NOT NULL
),
n AS (SELECT user_id, MAX(i) AS n FROM s GROUP BY user_id),
r AS (
  SELECT user_id, i, x AS y FROM s WHERE i = 1
  UNION ALL
  SELECT s.user_id, s.i, (15 * s.x + 85 * r.y) // 100
  FROM r JOIN s ON s.user_id = r.user_id AND s.i = r.i + 1
)
SELECT r.user_id,
       CAST(n.n AS BIGINT) AS n_events,
       CAST(r.y AS BIGINT) AS ewma_cents
FROM r JOIN n ON n.user_id = r.user_id AND r.i = n.n
ORDER BY r.user_id
"""

ORACLE_QUERIES["ewma_user_values"] = (q_ewma_user_values, SQL_EWMA_USER_VALUES)


def q_longest_streak(sf_dir: str):
    ev = _pq(sf_dir, "events", ["user_id", "ts"])

    def days(t: pa.Table) -> pa.Table:
        d = (
            t["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        df = pd.DataFrame(
            {
                "user_id": t["user_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "day": d,
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def streaks(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        if df.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype=np.int64),
                    "longest_streak": pd.Series(dtype=np.int64),
                }
            )
        rank = df.groupby("user_id", sort=False).cumcount()
        df = df.assign(isl=df["day"].to_numpy(np.int64) - rank.to_numpy())
        runs = (
            df.groupby(["user_id", "isl"], sort=False)
            .size()
            .reset_index(name="run")
        )
        return (
            runs.groupby("user_id", sort=False)["run"]
            .max()
            .reset_index(name="longest_streak")
        )

    out = hash_aggregate(
        ev.map_batches(days, batch_format="pyarrow"),
        ["user_id"],
        streaks,
    )
    df = collect_sorted(out, ["user_id"])
    if df.empty or "user_id" not in df.columns:
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "longest_streak": pd.Series(dtype=np.int64),
            }
        )
    df["user_id"] = df["user_id"].astype(np.int64)
    df["longest_streak"] = df["longest_streak"].astype(np.int64)
    return df[["user_id", "longest_streak"]]


SQL_LONGEST_STREAK = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT)
             AS day
  FROM events
  WHERE user_id IS NOT NULL
),
i AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY day
         ) AS isl
  FROM d
),
c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS run
  FROM i GROUP BY user_id, isl
)
SELECT user_id, CAST(MAX(run) AS BIGINT) AS longest_streak
FROM c GROUP BY user_id
ORDER BY user_id
"""

ORACLE_QUERIES["longest_streak"] = (q_longest_streak, SQL_LONGEST_STREAK)
