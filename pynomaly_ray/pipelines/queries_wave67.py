"""Wave-67: rolling 7-day active users (windowed COUNT DISTINCT).

``weekly_active_users`` — for every day d, the number of distinct
users active in [d-6, d]: the rolling-WAU KPI, i.e. a SLIDING-window
distinct count.  Carrying distinct sets per window does not scale;
instead each user's distinct activity DAY (u, a) is replicated to the
7 window days it serves (d = a .. a+6, capped at the corpus max day)
and distinctness is re-established per (d, u) — the same replicate-
then-dedup trick hopping_window_counts uses for counts, extended to
DISTINCT by keying the second exchange on the (day, user) pair so
dedup and per-day partial counting happen in one reducer.  Exchange
volume is 7× the distinct (user, day) pairs — bounded and flat —
and the driver folds only day-keyed partials (time-bounded, like the
hourly spine queries).  The SQL twin replicates via generate_series,
so gap days (no activity in any of the 6 prior days) are absent on
BOTH sides by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq

_DAY_US = 86_400_000_000
_WINDOW = 7


def q_weekly_active_users(sf_dir: str):
    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        day = df["ts"].astype("int64").to_numpy() // _DAY_US
        d = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "day": day}
        ).drop_duplicates()
        return _from_pandas(d)

    pairs = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["user_id", "day"],
        lambda df: df.drop_duplicates(["user_id", "day"]),
    ).materialize()

    # corpus max activity day: one partial row per block
    def block_max(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "day" not in t.schema.names:
            return pa.table({"mx": pa.array([], pa.int64())})
        return pa.table(
            {
                "mx": pa.array(
                    [int(t["day"].to_numpy(zero_copy_only=False).max())],
                    pa.int64(),
                )
            }
        )

    mx_rows = pairs.map_batches(block_max, batch_format="pyarrow").to_pandas()
    if mx_rows.empty:
        return pd.DataFrame(
            {"day": pd.Series(dtype=np.int64), "wau": pd.Series(dtype=np.int64)}
        )
    mxd = int(mx_rows["mx"].max())

    def replicate(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = t["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (
            np.repeat(a, _WINDOW)
            + np.tile(np.arange(_WINDOW, dtype=np.int64), len(a))
        )
        uu = np.repeat(u, _WINDOW)
        keep = d <= mxd
        out = pd.DataFrame({"d": d[keep], "user_id": uu[keep]}).drop_duplicates()
        return _from_pandas(out)

    def dedup_count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["d", "user_id"])
        out = (
            d.groupby("d", sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    partials = hash_aggregate(
        pairs.map_batches(replicate, batch_format="pyarrow"),
        ["d", "user_id"],
        dedup_count,
    ).to_pandas()
    out = (
        partials.groupby("d", sort=True)["cnt"]
        .sum()
        .reset_index()
        .rename(columns={"d": "day", "cnt": "wau"})
    )
    out["day"] = out["day"].astype(np.int64)
    out["wau"] = out["wau"].astype(np.int64)
    return out


SQL_WEEKLY_ACTIVE_USERS = """
WITH a AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day
  FROM events
),
mx AS (SELECT MAX(day) AS mxd FROM a),
r AS (
  SELECT user_id, UNNEST(generate_series(day, day + 6)) AS d FROM a
),
w AS (
  SELECT DISTINCT user_id, d FROM r CROSS JOIN mx WHERE d <= mx.mxd
)
SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS wau
FROM w GROUP BY d ORDER BY day
"""


ORACLE_QUERIES["weekly_active_users"] = (
    q_weekly_active_users,
    SQL_WEEKLY_ACTIVE_USERS,
)
