"""Wave-62: hourly lag-1 autocorrelation sufficient statistics.

``hourly_autocorr`` — per event type, the EXACT integer sufficient
statistics (n, Σx, Σx², Σ x_t·x_{t+1}) of the DENSE hourly event-count
series (gap hours count as 0, the hourly_gap_fill spine convention), so
the caller's one float r₁ = (n·sxy' − ...)/... — any standard lag-1
estimator — is computed off exact integers.  This is the engine's
time-series seasonality/burstiness screen (an hourly series with
strong lag-1 correlation batches poorly for streaming ingest).

Engine shape: the per-(type, hour) counts come from ONE keyed exchange
(the hourly_events partial+final pattern); the dense-series fold is
driver-side but bounded by the TIME SPAN × #types, never the corpus —
at 100 TB the hour domain grows with calendar time, not data volume
(same argument as hourly_gap_fill's spine).  Adjacency products need
the dense grid, and the grid is exactly what the driver holds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq

_HOUR_US = 3_600_000_000


def q_hourly_autocorr(sf_dir: str):
    ds = _pq(sf_dir, "events", ["event_type", "ts"])

    def partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        h = df["ts"].astype("int64").to_numpy() // _HOUR_US
        d = (
            pd.DataFrame(
                {
                    "event_type": df["event_type"].to_numpy(object),
                    "h": h,
                    "cnt": np.int64(1),
                }
            )
            .groupby(["event_type", "h"], sort=False)
            .sum()
            .reset_index()
        )
        return _from_pandas(d)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["event_type", "h"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )

    counts = hash_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["event_type", "h"],
        fold,
    ).to_pandas()
    if counts.empty:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64),
                "sx": pd.Series(dtype=np.int64),
                "sxx": pd.Series(dtype=np.int64),
                "sxy": pd.Series(dtype=np.int64),
            }
        )
    mn, mx = int(counts["h"].min()), int(counts["h"].max())
    span = mx - mn + 1
    rows = []
    for et in sorted(counts["event_type"].unique()):
        g = counts[counts["event_type"] == et]
        x = np.zeros(span, dtype=np.int64)
        x[g["h"].to_numpy(np.int64) - mn] = g["cnt"].to_numpy(np.int64)
        rows.append(
            (
                et,
                span,
                int(x.sum()),
                int((x * x).sum()),
                int((x[:-1] * x[1:]).sum()),
            )
        )
    out = pd.DataFrame(
        rows, columns=["event_type", "n", "sx", "sxx", "sxy"]
    )
    for c in ["n", "sx", "sxx", "sxy"]:
        out[c] = out[c].astype(np.int64)
    return out


SQL_HOURLY_AUTOCORR = """
WITH c AS (
  SELECT event_type,
         CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM c),
spine AS (
  SELECT t.event_type, gs.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT UNNEST(generate_series(mn, mx)) AS h FROM b
  ) gs
),
s AS (
  SELECT spine.event_type, spine.h, COALESCE(c.cnt, 0) AS x
  FROM spine LEFT JOIN c
    ON spine.event_type = c.event_type AND spine.h = c.h
),
w AS (
  SELECT event_type, x,
         LEAD(x) OVER (PARTITION BY event_type ORDER BY h) AS nx
  FROM s
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS sx,
       CAST(SUM(x * x) AS BIGINT) AS sxx,
       CAST(SUM(CASE WHEN nx IS NULL THEN 0 ELSE x * nx END) AS BIGINT)
         AS sxy
FROM w GROUP BY event_type ORDER BY event_type
"""


ORACLE_QUERIES["hourly_autocorr"] = (q_hourly_autocorr, SQL_HOURLY_AUTOCORR)
