"""Wave-65: three-step ordered funnel (first-touch chaining).

``funnel_steps3`` — signup → view → purchase, each step strictly after
the previous matched step and within 24 h of it, first-touch semantics
(t1 = the user's EARLIEST signup; t2 = earliest qualifying view after
t1; t3 = earliest qualifying purchase after t2).  Extends the suite's
two-step ``event_funnel`` to the chained multi-step shape where each
step's window anchors on the PREVIOUS step's match, not the funnel
start — the semantics product-analytics funnels actually use.

Engine shape: one user-keyed exchange; inside each bucket the three
step resolutions are vectorized pandas merges on the bucket's users
(per-user event counts are Zipf-small; a bucket never sees more than
its key range's rows).  Each bucket emits ONE partial row of step
counts — the driver folds #buckets rows, never user rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq

_DAY_US = 86_400_000_000
_STEPS = ("signup", "view", "purchase")


def q_funnel_steps3(sf_dir: str):
    ds = _pq(sf_dir, "events", ["user_id", "event_type", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["event_type"].isin(_STEPS)]
        return _from_pandas(
            pd.DataFrame(
                {
                    "user_id": df["user_id"].to_numpy(np.int64),
                    "event_type": df["event_type"].to_numpy(object),
                    "ts_us": df["ts"].astype("int64").to_numpy(),
                }
            )
        )

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "n_signup": pd.Series(dtype=np.int64),
                    "n_view24": pd.Series(dtype=np.int64),
                    "n_purchase24": pd.Series(dtype=np.int64),
                }
            )
        s = (
            df[df["event_type"] == "signup"]
            .groupby("user_id", sort=False)["ts_us"]
            .min()
            .rename("t1")
            .reset_index()
        )
        v = df[df["event_type"] == "view"].merge(s, on="user_id")
        v = v[(v["ts_us"] > v["t1"]) & (v["ts_us"] <= v["t1"] + _DAY_US)]
        v2 = (
            v.groupby("user_id", sort=False)["ts_us"]
            .min()
            .rename("t2")
            .reset_index()
        )
        p = df[df["event_type"] == "purchase"].merge(v2, on="user_id")
        p = p[(p["ts_us"] > p["t2"]) & (p["ts_us"] <= p["t2"] + _DAY_US)]
        n3 = p["user_id"].nunique()
        return pd.DataFrame(
            {
                "n_signup": np.array([len(s)], dtype=np.int64),
                "n_view24": np.array([len(v2)], dtype=np.int64),
                "n_purchase24": np.array([n3], dtype=np.int64),
            }
        )

    partials = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"), ["user_id"], funnel
    ).to_pandas()
    out = pd.DataFrame(
        {
            "n_signup": np.array(
                [partials["n_signup"].sum()], dtype=np.int64
            ),
            "n_view24": np.array(
                [partials["n_view24"].sum()], dtype=np.int64
            ),
            "n_purchase24": np.array(
                [partials["n_purchase24"].sum()], dtype=np.int64
            ),
        }
    )
    return out


SQL_FUNNEL_STEPS3 = """
WITH s AS (
  SELECT user_id, MIN(ts) AS t1
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
v AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'view'
    AND e.ts > s.t1 AND e.ts <= s.t1 + INTERVAL 24 HOUR
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > v.t2 AND e.ts <= v.t2 + INTERVAL 24 HOUR
  GROUP BY e.user_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_signup,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view24,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase24
"""


ORACLE_QUERIES["funnel_steps3"] = (q_funnel_steps3, SQL_FUNNEL_STEPS3)
