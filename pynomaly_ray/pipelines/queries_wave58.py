"""Wave-58: order-insensitive table checksums and top session journeys.

``table_checksum`` — the cross-engine content-verification primitive a
migration or replication pipeline runs on both sides: an
order-insensitive, duplicate-sensitive digest (SUM of a deterministic
per-row integer hash — XOR would cancel duplicated rows) plus the row
count, over the orders table's key columns.  The row hash is the
engine's pinned Knuth formula composed across columns, so DuckDB
reproduces it bit-for-bit.  Map-side scalar partials; nothing
shuffles.

``session_paths`` — product-analytics journey mining: events sessionize
per user at the suite's 30-minute gap, each session's first 8 event
types join into a '>'-separated path string, and the 5 most common
paths win (count DESC, path ASC).  Engine shape: one user-keyed
exchange builds paths with vectorized island detection (the only
Python-level work is the per-session string join, same as every
ordered-reassembly op), then a tiny path-keyed partial-sum exchange
and a k=5 top-k.
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

_SESSION_GAP_US = 30 * 60 * 1_000_000
_PATH_CAP = 8
_PATH_K = 5
_M32 = 4294967296
_KNUTH = 2654435761


def q_table_checksum(sf_dir: str):
    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        from pynomaly_ray.functions.hashing import knuth32

        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-row hash: knuth(key) mixed with knuth(custkey) on a
        # different seed — SUM is order-insensitive but dup-sensitive
        h = knuth32(ok, seed=1) * np.int64(3) + knuth32(ck, seed=2)
        return pa.table(
            {
                "n_rows": pa.array([len(ok)], pa.int64()),
                "checksum": pa.array([int(h.sum())], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "n_rows": np.array([int(parts["n_rows"].sum())], np.int64),
            "checksum": np.array([int(parts["checksum"].sum())], np.int64),
        }
    )


SQL_TABLE_CHECKSUM = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(
         CAST(((o_orderkey + 1) % {_M32}) * {_KNUTH}::HUGEINT % {_M32}
              AS BIGINT) * 3
         + CAST(((o_custkey + 2) % {_M32}) * {_KNUTH}::HUGEINT % {_M32}
                AS BIGINT)
       ) AS BIGINT) AS checksum
FROM orders
"""


def q_session_paths(sf_dir: str):
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["ts_us"] = df.pop("ts").astype("int64")
        return _from_pandas(df)

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "path": pd.Series(dtype=object),
                    "cnt": pd.Series(dtype=np.int64),
                }
            )
        d = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy(np.int64)
        ts = d["ts_us"].to_numpy(np.int64)
        et = d["event_type"].to_numpy(object)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap = np.r_[np.int64(0), np.diff(ts)]
        start = new_user | (gap > _SESSION_GAP_US)
        sess = np.cumsum(start)
        # rank within session; keep the first _PATH_CAP events
        first_idx = np.nonzero(start)[0]
        offsets = np.zeros(len(sess), np.int64)
        offsets[first_idx] = np.arange(len(sess))[first_idx]
        np.maximum.accumulate(offsets, out=offsets)
        rank = np.arange(len(sess)) - offsets
        keep = rank < _PATH_CAP
        g = (
            pd.Series(et[keep], dtype=object)
            .groupby(sess[keep])
            .agg(">".join)
            .value_counts()
            .rename_axis("path")
            .reset_index(name="cnt")
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    per_path = hash_aggregate(
        hash_aggregate(
            ds.map_batches(pre, batch_format="pyarrow"), ["user_id"], paths
        ),
        ["path"],
        lambda df: df.groupby("path", sort=False)["cnt"].sum().reset_index(),
    )
    out = topk(per_path, ["cnt", "path"], _PATH_K, descending=[True, False])
    out["cnt"] = out["cnt"].astype(np.int64)
    return out[["path", "cnt"]]


SQL_SESSION_PATHS = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY epoch_us(ts), event_id
              ) > {_SESSION_GAP_US} OR LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY epoch_us(ts), event_id
              ) IS NULL THEN 1 ELSE 0 END AS is_start
  FROM events
),
s AS (
  SELECT *, SUM(is_start) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
         ) AS sess
  FROM e
),
r AS (
  SELECT user_id, sess, event_type,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, sess ORDER BY ts_us, event_id
         ) AS rn, ts_us, event_id
  FROM s
),
p AS (
  SELECT user_id, sess,
         string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
  FROM r WHERE rn <= {_PATH_CAP}
  GROUP BY user_id, sess
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS cnt
FROM p GROUP BY path
ORDER BY cnt DESC, path
LIMIT {_PATH_K}
"""


ORACLE_QUERIES["table_checksum"] = (q_table_checksum, SQL_TABLE_CHECKSUM)
ORACLE_QUERIES["session_paths"] = (q_session_paths, SQL_SESSION_PATHS)
