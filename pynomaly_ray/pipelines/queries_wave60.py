"""Wave-60: offline-eval statistics — exact AUC and A/B readout.

``auc_eval`` — EXACT Mann-Whitney AUC of ``value`` as a ranking score
for purchase events, via the count-vector sufficient statistic: one
cents-keyed exchange pre-aggregates (n_pos, n_neg) per DISTINCT cents
value, so the driver's rank-sum pass is bounded by the value DOMAIN
(<= ~2e6 distinct cents), never the corpus.  Ties use average ranks;
the surface stays integer by carrying 2*rank_sum (``r2_pos``): for a
tie group of size t starting after ``cum`` smaller values, each member's
average rank is cum + (t+1)/2, so the group's positives contribute
p * (2*cum + t + 1) — always even-denominator-free.  AUC =
u2 / (2*n_pos*n_neg) is the caller's one float; u2 = r2_pos -
n_pos*(n_pos+1) is the classic U from rank sums.  This is the engine's
offline ranking-eval primitive (the binary-label complement of
``mrr_eval``'s retrieval grading).

``ab_test_variants`` — deterministic experiment assignment + conversion
counts: variant = knuth32(user_id, seed=7) % 2 (the one shared hash —
re-running on a re-sharded 100-TB corpus assigns identically), exposure
= any event, conversion = any purchase.  Per-user collapse happens
inside a user-keyed exchange (distinct users per bucket, never a global
distinct), variant partials fold to 2 rows.  The z/chi-square decision
is read-time arithmetic on the exact integer counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted, hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq

# cents domain guard: the driver-side rank pass holds one row per
# DISTINCT cents value; a value column with an unbounded domain must go
# through the KLL path instead (same contract as global_kth_smallest)
_AUC_DOMAIN_CAP = 2_000_001


def q_auc_eval(sf_dir: str):
    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["value"].notna()]
        if df.empty:
            return _from_pandas(
                pd.DataFrame(
                    {
                        "cents": pd.Series(dtype=np.int64),
                        "p": pd.Series(dtype=np.int64),
                        "q": pd.Series(dtype=np.int64),
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
            pd.DataFrame({"cents": cents, "p": pos, "q": 1 - pos})
            .groupby("cents", sort=False)
            .sum()
            .reset_index()
        )
        return _from_pandas(d)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cents", sort=False)[["p", "q"]].sum().reset_index()

    per_value = collect_sorted(
        hash_aggregate(
            ds.map_batches(partials, batch_format="pyarrow"), ["cents"], fold
        ),
        ["cents"],
    )
    if len(per_value) > _AUC_DOMAIN_CAP:
        raise ValueError(
            "auc_eval: score domain exceeds the driver rank-pass cap "
            f"({len(per_value)} distinct values > {_AUC_DOMAIN_CAP}); "
            "quantize the score or use the KLL sketch path"
        )
    p = per_value["p"].to_numpy(np.int64)
    q = per_value["q"].to_numpy(np.int64)
    t = p + q
    cum = np.concatenate(([0], np.cumsum(t)[:-1]))
    n_pos = int(p.sum())
    n_neg = int(q.sum())
    r2_pos = int((p * (2 * cum + t + 1)).sum())
    u2 = r2_pos - n_pos * (n_pos + 1)
    return pd.DataFrame(
        {
            "n_pos": np.array([n_pos], dtype=np.int64),
            "n_neg": np.array([n_neg], dtype=np.int64),
            "u2": np.array([u2], dtype=np.int64),
        }
    )


SQL_AUC_EVAL = """
WITH e AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events WHERE value IS NOT NULL
),
g AS (
  SELECT cents, SUM(pos) AS p, COUNT(*) - SUM(pos) AS q
  FROM e GROUP BY cents
),
w AS (
  SELECT p, q, p + q AS t,
         COALESCE(SUM(p + q) OVER (
           ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum
  FROM g
)
SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(SUM(q) AS BIGINT) AS n_neg,
       CAST(SUM(p * (2 * cum + t + 1))
            - SUM(p) * (SUM(p) + 1) AS BIGINT) AS u2
FROM w
"""


def q_ab_test_variants(sf_dir: str):
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def user_partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        conv = (df["event_type"].to_numpy(object) == "purchase").astype(
            np.int64
        )
        d = (
            pd.DataFrame(
                {"user_id": df["user_id"].to_numpy(np.int64), "conv": conv}
            )
            .groupby("user_id", sort=False)
            .max()
            .reset_index()
        )
        return _from_pandas(d)

    def variant_fold(df: pd.DataFrame) -> pd.DataFrame:
        from pynomaly_ray.functions.hashing import knuth32

        u = df.groupby("user_id", sort=False)["conv"].max().reset_index()
        variant = knuth32(u["user_id"].to_numpy(np.int64), 7) % 2
        out = (
            pd.DataFrame(
                {
                    "variant": variant,
                    "n_users": np.int64(1),
                    "n_converted": u["conv"].to_numpy(np.int64),
                }
            )
            .groupby("variant", sort=False)
            .sum()
            .reset_index()
        )
        return out

    partial = hash_aggregate(
        ds.map_batches(user_partials, batch_format="pyarrow"),
        ["user_id"],
        variant_fold,
    )
    df = partial.to_pandas()
    out = (
        df.groupby("variant", sort=False)[["n_users", "n_converted"]]
        .sum()
        .reset_index()
        .sort_values("variant", kind="mergesort")
        .reset_index(drop=True)
    )
    out["variant"] = out["variant"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    out["n_converted"] = out["n_converted"].astype(np.int64)
    return out


SQL_AB_TEST_VARIANTS = """
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
)
SELECT CAST(((user_id + 7) % 4294967296) * 2654435761::HUGEINT
            % 4294967296 % 2 AS BIGINT) AS variant,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(conv) AS BIGINT) AS n_converted
FROM u GROUP BY variant ORDER BY variant
"""


ORACLE_QUERIES["auc_eval"] = (q_auc_eval, SQL_AUC_EVAL)
ORACLE_QUERIES["ab_test_variants"] = (
    q_ab_test_variants,
    SQL_AB_TEST_VARIANTS,
)
