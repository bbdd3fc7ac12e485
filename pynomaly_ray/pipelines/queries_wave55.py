"""Wave-55: hourly active-user churn and linear multi-touch
attribution — engagement-analytics operators certified integer-exact.

``hourly_churn`` — per hour: active users, retained users (also active
the PREVIOUS hour), and new-to-this-hour users.  The stickiness
decomposition every engagement dashboard carries (n_active =
n_retained + n_new by construction).  Engine shape: distinct
(user, hour) pairs shrink map-side, one user-keyed exchange computes
each user's adjacent-hour transitions with a vectorized diff, and a
tiny per-hour partial-sum exchange finishes — the per-user series
never leaves its bucket.

``attribution_linear`` — linear multi-touch attribution: every click/
view in the 2 h window before a purchase shares that purchase's
10000-point credit equally (integer division; the remainder is
deliberately dropped on BOTH sides so the surface stays exact).
Completes the attribution family next to ``attribution_last_touch``.
Engine shape: one user-keyed exchange; per bucket, each channel's
window counts come from two offset-keyed searchsorteds over ALL users
at once (same private-block kernel as nearest_event_join, same
headroom asserts) — no per-purchase loop, no pair materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted, hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq

_HOUR_US = 3_600_000_000
_LOOKBACK_US = 2 * _HOUR_US
_CREDIT = 10_000
_TOUCH_TYPES = ("click", "view")


# ---------------------------------------------------------------------------
# hourly_churn
# ---------------------------------------------------------------------------


def q_hourly_churn(sf_dir: str):
    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        hour = df["ts"].astype("int64").to_numpy() // _HOUR_US
        d = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "hour": hour}
        ).drop_duplicates()
        return _from_pandas(d)

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "hour": pd.Series(dtype=np.int64),
                    "n_active": pd.Series(dtype=np.int64),
                    "n_retained": pd.Series(dtype=np.int64),
                }
            )
        d = df.drop_duplicates().sort_values(
            ["user_id", "hour"], kind="mergesort"
        )
        uid = d["user_id"].to_numpy(np.int64)
        h = d["hour"].to_numpy(np.int64)
        same = np.r_[False, uid[1:] == uid[:-1]]
        retained = same & (np.r_[np.int64(0), np.diff(h)] == 1)
        g = (
            pd.DataFrame({"hour": h, "r": retained.astype(np.int64)})
            .groupby("hour", sort=False)["r"]
            .agg(n_active="size", n_retained="sum")
            .reset_index()
        )
        return g

    parts = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"), ["user_id"], transitions
    )
    out = hash_aggregate(
        parts,
        ["hour"],
        lambda df: df.groupby("hour", sort=False)
        .agg(n_active=("n_active", "sum"), n_retained=("n_retained", "sum"))
        .reset_index(),
    )
    res = collect_sorted(out, ["hour"])
    res["n_new"] = res["n_active"] - res["n_retained"]
    for c in ("hour", "n_active", "n_retained", "n_new"):
        res[c] = res[c].astype(np.int64)
    return res[["hour", "n_active", "n_retained", "n_new"]]


SQL_HOURLY_CHURN = f"""
WITH d AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // {_HOUR_US} AS hour
  FROM events
),
t AS (
  SELECT hour,
         CASE WHEN LAG(hour) OVER (
                PARTITION BY user_id ORDER BY hour
              ) = hour - 1 THEN 1 ELSE 0 END AS retained
  FROM d
)
SELECT CAST(hour AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(retained) AS BIGINT) AS n_retained,
       CAST(COUNT(*) - SUM(retained) AS BIGINT) AS n_new
FROM t GROUP BY hour ORDER BY hour
"""


# ---------------------------------------------------------------------------
# attribution_linear
# ---------------------------------------------------------------------------


def q_attribution_linear(sf_dir: str):
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["event_type"].isin(["purchase", *_TOUCH_TYPES])]
        df["ts_us"] = df.pop("ts").astype("int64")
        return _from_pandas(df)

    def credit(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "channel": pd.Series(dtype=object),
                "credit_e4": pd.Series(dtype=np.int64),
                "n_touches": pd.Series(dtype=np.int64),
            }
        )
        if df.empty:
            return empty
        is_p = df["event_type"].to_numpy(object) == "purchase"
        p_user = df["user_id"].to_numpy(np.int64)[is_p]
        p_ts = df["ts_us"].to_numpy(np.int64)[is_p]
        if len(p_user) == 0:
            return empty
        users = np.unique(df["user_id"].to_numpy(np.int64))
        t0 = int(df["ts_us"].min())
        span = int(df["ts_us"].max()) - t0
        assert span < (1 << 44) and len(users) < (1 << 19), (
            "attribution_linear bucket exceeds offset-key headroom; "
            "raise the exchange fan-out"
        )
        gp = np.searchsorted(users, p_user).astype(np.int64)
        pk = (gp << np.int64(44)) | (p_ts - t0)
        # per-channel in-window counts via one searchsorted pair each
        per_chan = {}
        for chan in _TOUCH_TYPES:
            m = df["event_type"].to_numpy(object) == chan
            cu = df["user_id"].to_numpy(np.int64)[m]
            ct = df["ts_us"].to_numpy(np.int64)[m]
            gc = np.searchsorted(users, cu).astype(np.int64)
            order = np.lexsort((ct, gc))
            ck = (gc[order] << np.int64(44)) | (ct[order] - t0)
            hi = np.searchsorted(ck, pk, side="left")  # t_us < p_us
            lo = np.searchsorted(
                ck, pk - np.int64(_LOOKBACK_US), side="right"
            )  # t_us > p_us - lookback
            per_chan[chan] = np.maximum(hi - lo, 0)
        n_total = sum(per_chan.values())
        has = n_total > 0
        if not has.any():
            return empty
        share = np.zeros(len(pk), np.int64)
        share[has] = _CREDIT // n_total[has]
        rows = []
        for chan in _TOUCH_TYPES:
            nc = per_chan[chan]
            rows.append(
                (chan, int((share * nc).sum()), int(nc[has].sum()))
            )
        out = pd.DataFrame(
            rows, columns=["channel", "credit_e4", "n_touches"]
        )
        return out[out["n_touches"] > 0]

    parts = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"), ["user_id"], credit
    )
    out = hash_aggregate(
        parts,
        ["channel"],
        lambda df: df.groupby("channel", sort=False)
        .agg(
            credit_e4=("credit_e4", "sum"), n_touches=("n_touches", "sum")
        )
        .reset_index(),
    )
    res = collect_sorted(out, ["channel"])
    for c in ("credit_e4", "n_touches"):
        res[c] = res[c].astype(np.int64)
    return res[["channel", "credit_e4", "n_touches"]]


SQL_ATTRIBUTION_LINEAR = f"""
WITH p AS (
  SELECT user_id, epoch_us(ts) AS p_us,
         ROW_NUMBER() OVER (ORDER BY user_id, epoch_us(ts)) AS pid
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us
  FROM events WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT p.pid, t.event_type AS channel
  FROM p JOIN t ON t.user_id = p.user_id
   AND t.t_us < p.p_us AND t.t_us > p.p_us - {_LOOKBACK_US}
),
n AS (SELECT pid, COUNT(*) AS n FROM j GROUP BY pid)
SELECT j.channel,
       CAST(SUM({_CREDIT} // n.n) AS BIGINT) AS credit_e4,
       CAST(COUNT(*) AS BIGINT) AS n_touches
FROM j JOIN n USING (pid)
GROUP BY j.channel ORDER BY j.channel
"""


ORACLE_QUERIES["hourly_churn"] = (q_hourly_churn, SQL_HOURLY_CHURN)
ORACLE_QUERIES["attribution_linear"] = (
    q_attribution_linear,
    SQL_ATTRIBUTION_LINEAR,
)
