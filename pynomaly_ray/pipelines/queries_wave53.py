"""Wave-53: nearest-neighbor temporal join and bitemporal point-in-time
state — completing the engine's time-join family (inner/left/full/
anti/semi equi joins, three ASOF variants, interval overlap, banded
self-join; this adds NEAREST and AS-OF-STATE).

``nearest_event_join`` — nearest-match temporal join: every error
event pairs with the temporally CLOSEST click of the same user
(backward or forward, min |dt|; ties prefer the earlier click — the
sensor-fusion / log-correlation join).  Engine shape: one keyed
exchange co-locates each user's errors and clicks; per bucket, both
sides sort once and a single searchsorted yields the backward and
forward candidates, the closer of which wins — O(n log n) per bucket,
never a quadratic pair set.  Output aggregates per user: matched
errors and the sum of absolute gaps (integer microseconds).

``as_of_state`` — bitemporal point lookup over the wave-50 SCD2
intervals: which version of each user's state was valid at one fixed
timestamp T (mid-corpus), counted per event_type.  The SCD2 build is
the same exchange as ``scd2_intervals``; the point filter rides the
bucket reducer so only matching versions leave the task — the
time-travel read every warehouse dimension serves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted, hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq

# fixed point-in-time: 2024-01-15 00:00:00 UTC in microseconds
_T_US = 1_705_276_800_000_000
_OPEN_END_US = 1 << 62


def q_nearest_event_join(sf_dir: str):
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["event_type"].isin(["error", "click"])]
        df["ts_us"] = df.pop("ts").astype("int64")
        return _from_pandas(df)

    def nearest(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "n_matched": pd.Series(dtype=np.int64),
                "sum_abs_gap_us": pd.Series(dtype=np.int64),
            }
        )
        if df.empty:
            return empty
        is_err = df["event_type"].to_numpy(object) == "error"
        e_user = df["user_id"].to_numpy(np.int64)[is_err]
        e_ts = df["ts_us"].to_numpy(np.int64)[is_err]
        c_user = df["user_id"].to_numpy(np.int64)[~is_err]
        c_ts = df["ts_us"].to_numpy(np.int64)[~is_err]
        if len(e_user) == 0 or len(c_user) == 0:
            return empty
        # offset-keyed single searchsorted across ALL users at once:
        # each user's clicks live in a private key block (g << 44 | dt),
        # valid while the bucket's time span stays under 2^44 us (~200
        # days) and it holds under 2^19 distinct users — both checked
        users = np.unique(np.r_[e_user, c_user])
        t0 = min(e_ts.min(), c_ts.min())
        span = max(e_ts.max(), c_ts.max()) - t0
        assert span < (1 << 44) and len(users) < (1 << 19), (
            "nearest_event_join bucket exceeds offset-key headroom; "
            "raise the exchange fan-out"
        )
        ge = np.searchsorted(users, e_user).astype(np.int64)
        gc = np.searchsorted(users, c_user).astype(np.int64)
        order = np.lexsort((c_ts, gc))
        gc, cts = gc[order], c_ts[order]
        ck = (gc << np.int64(44)) | (cts - t0)
        ek = (ge << np.int64(44)) | (e_ts - t0)
        pos = np.searchsorted(ck, ek, side="right")
        back_ok = np.zeros(len(ek), bool)
        back_gap = np.zeros(len(ek), np.int64)
        has_prev = pos > 0
        prev = np.maximum(pos - 1, 0)
        back_ok[has_prev] = gc[prev[has_prev]] == ge[has_prev]
        back_gap[:] = e_ts - np.where(has_prev, cts[prev], 0)
        fwd_ok = np.zeros(len(ek), bool)
        fwd_gap = np.zeros(len(ek), np.int64)
        has_next = pos < len(ck)
        nxt = np.minimum(pos, len(ck) - 1)
        fwd_ok[has_next] = gc[nxt[has_next]] == ge[has_next]
        fwd_gap[:] = np.where(has_next, cts[nxt], 0) - e_ts
        back_ok &= has_prev
        fwd_ok &= has_next
        gap = np.where(
            back_ok & (~fwd_ok | (back_gap <= fwd_gap)), back_gap, fwd_gap
        )
        matched = back_ok | fwd_ok
        if not matched.any():
            return empty
        per = (
            pd.DataFrame(
                {"user_id": e_user[matched], "gap": gap[matched]}
            )
            .groupby("user_id", sort=False)["gap"]
            .agg(n_matched="size", sum_abs_gap_us="sum")
            .reset_index()
        )
        return per

    out = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"), ["user_id"], nearest
    )
    df = collect_sorted(out, ["user_id"])
    if df.empty or "user_id" not in df.columns:
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "n_matched": pd.Series(dtype=np.int64),
                "sum_abs_gap_us": pd.Series(dtype=np.int64),
            }
        )
    for c in ("user_id", "n_matched", "sum_abs_gap_us"):
        df[c] = df[c].astype(np.int64)
    return df[["user_id", "n_matched", "sum_abs_gap_us"]]


SQL_NEAREST_EVENT_JOIN = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'error'
),
c AS (
  SELECT user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'click'
),
n AS (
  SELECT e.user_id,
         MIN(ABS(c.ts_us - e.ts_us)) AS gap
  FROM e JOIN c ON c.user_id = e.user_id
  GROUP BY e.user_id, e.ts_us
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_matched,
       CAST(SUM(gap) AS BIGINT) AS sum_abs_gap_us
FROM n GROUP BY user_id ORDER BY user_id
"""


def q_as_of_state(sf_dir: str):
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["ts_us"] = df.pop("ts").astype("int64")
        return _from_pandas(df)

    def state_at(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype=object),
                    "n_users": pd.Series(dtype=np.int64),
                }
            )
        d = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy(np.int64)
        et = d["event_type"].to_numpy(object)
        ts = d["ts_us"].to_numpy(np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        type_change = np.r_[True, et[1:] != et[:-1]]
        change = new_user | type_change
        starts = np.nonzero(change)[0]
        v_from = ts[starts]
        v_user = uid[starts]
        v_type = et[starts]
        nxt_from = np.r_[v_from[1:], np.int64(_OPEN_END_US)]
        nxt_user = np.r_[v_user[1:], np.int64(-1)]
        v_to = np.where(nxt_user == v_user, nxt_from, np.int64(_OPEN_END_US))
        live = (v_from <= _T_US) & (_T_US < v_to)
        if not live.any():
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype=object),
                    "n_users": pd.Series(dtype=np.int64),
                }
            )
        return (
            pd.Series(v_type[live])
            .value_counts()
            .rename_axis("event_type")
            .reset_index(name="n_users")
        )

    parts = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"), ["user_id"], state_at
    )
    out = hash_aggregate(
        parts,
        ["event_type"],
        lambda df: df.groupby("event_type", sort=False)["n_users"]
        .sum()
        .reset_index(),
    )
    df = collect_sorted(out, ["event_type"])
    df["n_users"] = df["n_users"].astype(np.int64)
    return df[["event_type", "n_users"]]


SQL_AS_OF_STATE = f"""
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
),
s AS (
  SELECT user_id, event_type, valid_from_us,
         COALESCE(LEAD(valid_from_us) OVER (
           PARTITION BY user_id ORDER BY valid_from_us
         ), CAST({_OPEN_END_US} AS BIGINT)) AS valid_to_us
  FROM v
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
FROM s
WHERE valid_from_us <= {_T_US} AND {_T_US} < valid_to_us
GROUP BY event_type ORDER BY event_type
"""


ORACLE_QUERIES["nearest_event_join"] = (
    q_nearest_event_join,
    SQL_NEAREST_EVENT_JOIN,
)
ORACLE_QUERIES["as_of_state"] = (q_as_of_state, SQL_AS_OF_STATE)
