"""Wave-64: exact global decile profile (quantile binning + lift).

``value_decile_profile`` — events bucketed by EXACT global deciles of
``value`` (nearest-rank thresholds, integer rule cum*10 >= d*N), with
per-decile event and purchase counts: the ranking-model lift-table
shape.  NTILE would be the naive SQL — but NTILE splits tie runs by an
arbitrary row order, so it is not reproducible across engines; the
threshold rule used here assigns every tied value to one deterministic
bucket on both sides (heavily-tied distributions may leave some decile
labels empty — identically on both sides).

Engine shape: ONE cents-keyed exchange builds the (cents -> n, n_pos)
count vector; thresholds, bucketing, AND the final per-decile fold all
happen on that value-DOMAIN-bounded table — the corpus is scanned
exactly once and the driver never holds a data row (same sufficient-
statistic argument as global_kth_smallest / winsorized_stats).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted, hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq


def q_value_decile_profile(sf_dir: str):
    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["value"].notna()]
        if df.empty:
            return _from_pandas(
                pd.DataFrame(
                    {
                        "cents": pd.Series(dtype=np.int64),
                        "cnt": pd.Series(dtype=np.int64),
                        "p": pd.Series(dtype=np.int64),
                    }
                )
            )
        cents = np.floor(
            df["value"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        pos = (df["event_type"].to_numpy(object) == "purchase").astype(
            np.int64
        )
        d = (
            pd.DataFrame({"cents": cents, "cnt": np.int64(1), "p": pos})
            .groupby("cents", sort=False)
            .sum()
            .reset_index()
        )
        return _from_pandas(d)

    per_value = collect_sorted(
        hash_aggregate(
            ds.map_batches(partials, batch_format="pyarrow"),
            ["cents"],
            lambda df: df.groupby("cents", sort=False)[["cnt", "p"]]
            .sum()
            .reset_index(),
        ),
        ["cents"],
    )
    if per_value.empty:
        return pd.DataFrame(
            {
                "decile": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64),
                "n_purchase": pd.Series(dtype=np.int64),
            }
        )
    cents = per_value["cents"].to_numpy(np.int64)
    cnt = per_value["cnt"].to_numpy(np.int64)
    p = per_value["p"].to_numpy(np.int64)
    cum = np.cumsum(cnt)
    total = int(cum[-1])
    # nearest-rank decile thresholds: first value with cum*10 >= d*N
    thr = np.array(
        [cents[np.searchsorted(cum * 10, d * total)] for d in range(1, 10)],
        dtype=np.int64,
    )
    bucket = (cents[:, None] > thr[None, :]).sum(axis=1).astype(np.int64)
    out = (
        pd.DataFrame({"decile": bucket, "n": cnt, "n_purchase": p})
        .groupby("decile", sort=True)
        .sum()
        .reset_index()
    )
    out["decile"] = out["decile"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    out["n_purchase"] = out["n_purchase"].astype(np.int64)
    return out


SQL_VALUE_DECILE_PROFILE = """
WITH e AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events WHERE value IS NOT NULL
),
g AS (
  SELECT cents, COUNT(*) AS cnt, SUM(pos) AS p FROM e GROUP BY cents
),
w AS (
  SELECT cents, cnt, p, SUM(cnt) OVER (ORDER BY cents) AS cum FROM g
),
n AS (SELECT SUM(cnt) AS total FROM g),
thr AS (
  SELECT d.d, MIN(w.cents) AS thr
  FROM (SELECT UNNEST(generate_series(1, 9)) AS d) d
  CROSS JOIN n
  JOIN w ON w.cum * 10 >= d.d * n.total
  GROUP BY d.d
),
b AS (
  SELECT w.cents, w.cnt, w.p,
         (SELECT COUNT(*) FROM thr WHERE w.cents > thr.thr) AS bucket
  FROM w
)
SELECT CAST(bucket AS BIGINT) AS decile,
       CAST(SUM(cnt) AS BIGINT) AS n,
       CAST(SUM(p) AS BIGINT) AS n_purchase
FROM b GROUP BY bucket ORDER BY bucket
"""


ORACLE_QUERIES["value_decile_profile"] = (
    q_value_decile_profile,
    SQL_VALUE_DECILE_PROFILE,
)
