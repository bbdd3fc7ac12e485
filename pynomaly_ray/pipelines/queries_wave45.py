"""Wave-45: sequential drift detection, deterministic MLM masking,
ordered-sequence pattern mining, and rolling-median smoothing.

Four operator families the suite did not yet cover, each with an
integer-exact DuckDB twin:

``cusum_shift`` — CUSUM change-point detection (Page 1954) over the
per-hour event-count series of every event type.  This is the
sequential-analysis complement to the engine's LoOP drift detector
(north star: distribution-drift checks over per-partition statistics):
LoOP flags *which partition* looks unlike its peers; CUSUM flags *when*
a monitored series shifted upward.  Integer-exact via the prefix-sum
identity ``S_t = ps_t - min(0, min_{j<=t} ps_j)`` for
``S_t = max(0, S_{t-1} + (x_t - k))`` — no recursion needed, so both
the vectorized kernel and the SQL twin are pure window algebra.

``mlm_mask`` — deterministic BERT-style token masking: every
whitespace token whose integer hash ``(doc_id*1000003 + idx*10007) %
100 < 15`` is replaced by the sentinel ``<X>`` and the corrupted text
is reassembled.  The mask is a pure function of (doc_id, position), so
the CORRUPTED STRING ITSELF is certified byte-exact against a DuckDB
zipped-unnest + ordered string_agg twin — the strongest possible check
for a masking pipeline (training corpora corrupted this way must be
reproducible across reruns and engines).  Embarrassingly parallel: one
map_batches pass, no exchange.

``line_flag_patterns`` — ordered string aggregation (sequence
reassembly): per order, the (returnflag+linestatus) sequence ordered by
line number, then the top-20 most common sequence patterns.  The
reassembly shape is what chunked-document reconstruction needs
(chunks -> ordered concat per doc).  NOTE: (l_orderkey, l_linenumber)
is NOT unique in this corpus (up to 6 duplicates), so the order key
includes the flag value itself — deterministic on both sides.

``rolling_median`` — per-user rolling median (ROWS 4 PRECEDING ..
CURRENT ROW) over integer cents, the robust-smoothing window family
(median-of-last-k) the suite's EWMA/trailing-sum windows did not
cover.  Reported doubled (``med2x``) so even-width windows at
partition starts stay integer-exact.  Reference semantics anchor:
PyNomaly's stream mode scores points against a trailing window of
state (reference/PyNomaly/loop.py:766-795); the rolling median is the
same trailing-window shape over a keyed stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import hash_aggregate, topk
from pynomaly_ray.pipelines.queries import (
    ORACLE_QUERIES,
    _cents,
    _from_pandas,
    _pq,
    collect_sorted,
)

_TOKEN_RE = r"[^ \t\n\r\f\v]+"
_HOUR_US = 3_600_000_000
_MASK_A = 1_000_003
_MASK_B = 10_007
_MASK_PCT = 15
_MASK_MOD = 17  # doc sample: doc_id % 17 == 0
_WINDOW = 5  # rolling-median width


# ---------------------------------------------------------------------------
# cusum_shift
# ---------------------------------------------------------------------------


def q_cusum_shift(sf_dir: str):
    """Per event type: max CUSUM statistic of the hourly-count series
    against its own integer mean level, and the hour where the maximum
    is first reached.  One count pass + one per-type exchange; the
    whole series of a type sits in one bucket (5-20 types — trivially
    balanced; a hot type is still only #hours rows)."""
    ds = _pq(sf_dir, "events", ["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour_bucket"] = df["ts"].astype("int64") // _HOUR_US
        g = (
            df.groupby(["event_type", "hour_bucket"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        return _from_pandas(g)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype=object),
                    "k_level": pd.Series(dtype=np.int64),
                    "max_cusum": pd.Series(dtype=np.int64),
                    "peak_hour": pd.Series(dtype=np.int64),
                }
            )
        h = (
            df.groupby(["event_type", "hour_bucket"], sort=False)["cnt"]
            .sum()
            .reset_index()
            .sort_values(["event_type", "hour_bucket"], kind="mergesort")
        )
        grp = h.groupby("event_type", sort=False)
        k = (grp["cnt"].transform("sum") // grp["cnt"].transform("size")).to_numpy(
            np.int64
        )
        y = h["cnt"].to_numpy(np.int64) - k
        ps = pd.Series(y).groupby(h["event_type"].to_numpy()).cumsum()
        rmin = ps.groupby(h["event_type"].to_numpy()).cummin().clip(upper=0)
        s = (ps - rmin).to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "event_type": h["event_type"].to_numpy(),
                "k_level": k,
                "hour_bucket": h["hour_bucket"].to_numpy(np.int64),
                "cusum": s,
            }
        )
        mx = out.groupby("event_type", sort=False)["cusum"].transform("max")
        out["max_cusum"] = mx
        peak = (
            out[out["cusum"] == mx]
            .groupby(["event_type", "k_level", "max_cusum"], sort=False)[
                "hour_bucket"
            ]
            .min()
            .rename("peak_hour")
            .reset_index()
        )
        return peak

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = hash_aggregate(partials, ["event_type"], merge)
    return collect_sorted(out, ["event_type"])


SQL_CUSUM_SHIFT = """
WITH h AS (
  SELECT event_type,
         CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), p AS (
  SELECT event_type, hour_bucket, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT)
           // CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
           AS k_level
  FROM h
), ps AS (
  SELECT event_type, k_level, hour_bucket,
         CAST(SUM(cnt - k_level) OVER (
              PARTITION BY event_type ORDER BY hour_bucket) AS BIGINT) AS pre
  FROM p
), s AS (
  SELECT event_type, k_level, hour_bucket,
         pre - LEAST(0, MIN(pre) OVER (
              PARTITION BY event_type ORDER BY hour_bucket)) AS cusum
  FROM ps
), m AS (
  SELECT event_type, k_level, hour_bucket, cusum,
         MAX(cusum) OVER (PARTITION BY event_type) AS mx
  FROM s
)
SELECT event_type, k_level, mx AS max_cusum,
       MIN(CASE WHEN cusum = mx THEN hour_bucket END) AS peak_hour
FROM m GROUP BY event_type, k_level, mx
"""


# ---------------------------------------------------------------------------
# mlm_mask
# ---------------------------------------------------------------------------


def q_mlm_mask(sf_dir: str):
    """Deterministic MLM corruption of the doc_id % 17 == 0 sample:
    token idx (0-based) is masked iff
    (doc_id*1000003 + idx*10007) % 100 < 15.  Pure map_batches — the
    mask is per-document, so no exchange; at 100 TB this runs at read
    bandwidth.  Docs with zero tokens are dropped (no maskable
    surface), matching the SQL twin's unnest semantics."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def corrupt(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["doc_id"] % _MASK_MOD == 0]
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_masked": pa.array([], pa.int64()),
                "corrupted": pa.array([], pa.string()),
            }
        )
        if df.empty:
            return empty
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        keep = lens > 0
        if not keep.any():
            return empty
        doc_ids = df["doc_id"].to_numpy(np.int64)[keep]
        lens = lens[keep]
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks[keep]]
        )
        rep = np.repeat(np.arange(len(doc_ids)), lens)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        idx = np.arange(len(flat)) - starts[rep]
        mask = (doc_ids[rep] * _MASK_A + idx * _MASK_B) % 100 < _MASK_PCT
        flat = flat.copy()
        flat[mask] = "<X>"
        n_masked = np.bincount(rep, weights=mask, minlength=len(doc_ids)).astype(
            np.int64
        )
        corrupted = (
            pd.Series(flat, dtype=object).groupby(rep).agg(" ".join).to_numpy()
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_masked": pa.array(n_masked, pa.int64()),
                "corrupted": pa.array(corrupted, pa.string()),
            }
        )

    out = ds.map_batches(corrupt, batch_format="pyarrow", batch_size=16384)
    return collect_sorted(out, ["doc_id"])


SQL_MLM_MASK = r"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '[^ \t\n\r\f\v]+') AS toks
  FROM documents WHERE doc_id % 17 = 0
), u AS (
  SELECT doc_id, unnest(toks) AS tok, unnest(range(len(toks))) AS idx
  FROM d
), m AS (
  SELECT doc_id, idx,
         CASE WHEN (doc_id * 1000003 + idx * 10007) % 100 < 15
              THEN '<X>' ELSE tok END AS tok2,
         CASE WHEN (doc_id * 1000003 + idx * 10007) % 100 < 15
              THEN 1 ELSE 0 END AS msk
  FROM u
)
SELECT doc_id, CAST(SUM(msk) AS BIGINT) AS n_masked,
       string_agg(tok2, ' ' ORDER BY idx) AS corrupted
FROM m GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# line_flag_patterns
# ---------------------------------------------------------------------------


def q_line_flag_patterns(sf_dir: str):
    """Top-20 (returnflag+linestatus) sequence patterns across orders.
    Order-keyed exchange reassembles each order's flag sequence ordered
    by (l_linenumber, flag) — the flag tie-break because line numbers
    repeat in this corpus — then pattern partial counts merge through a
    second tiny keyed exchange and a driver top-k.  The per-order
    string join is pandas' C-level agg over ~7-row groups; everything
    upstream of it is a projection."""
    ds = _pq(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"],
    )

    def slim(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table(
            {
                "okey": batch["l_orderkey"].cast(pa.int64()),
                "ln": batch["l_linenumber"].cast(pa.int64()),
                "fl": pa.array(
                    (df["l_returnflag"] + df["l_linestatus"]).to_numpy(
                        dtype=object
                    ),
                    pa.string(),
                ),
            }
        )

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "pattern": pd.Series(dtype=object),
                    "cnt": pd.Series(dtype=np.int64),
                }
            )
        df = df.sort_values(["okey", "ln", "fl"], kind="mergesort")
        pat = df.groupby("okey", sort=False)["fl"].agg("".join)
        out = pat.value_counts().rename("cnt").rename_axis("pattern").reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("pattern", sort=False)["cnt"].sum().reset_index()

    slimmed = ds.map_batches(slim, batch_format="pyarrow", batch_size=65536)
    per_order = hash_aggregate(slimmed, ["okey"], assemble)
    merged = hash_aggregate(per_order, ["pattern"], merge)
    out = topk(merged, ["cnt", "pattern"], 20, descending=[True, False])
    return out.reset_index(drop=True)


SQL_LINE_FLAG_PATTERNS = """
WITH o AS (
  SELECT string_agg(l_returnflag || l_linestatus, ''
                    ORDER BY l_linenumber,
                             l_returnflag || l_linestatus) AS pattern
  FROM lineitem GROUP BY l_orderkey
)
SELECT pattern, CAST(COUNT(*) AS BIGINT) AS cnt
FROM o GROUP BY pattern
ORDER BY cnt DESC, pattern
LIMIT 20
"""


# ---------------------------------------------------------------------------
# rolling_median
# ---------------------------------------------------------------------------


def q_rolling_median(sf_dir: str):
    """Per user: the max over time of the rolling median (last 5
    events by (ts, event_id)) of value cents, doubled so the
    even-width warm-up windows stay integer.  User-keyed exchange;
    pandas' cython rolling-median kernel per bucket."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def slim(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table(
            {
                "user_id": batch["user_id"].cast(pa.int64()),
                "ts": batch["ts"],
                "event_id": batch["event_id"].cast(pa.int64()),
                "c": pa.array(_cents(df["value"].to_numpy()), pa.int64()),
            }
        )

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype=np.int64),
                    "n_events": pd.Series(dtype=np.int64),
                    "max_med2x": pd.Series(dtype=np.int64),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        med = (
            df.groupby("user_id", sort=False)["c"]
            .rolling(_WINDOW, min_periods=1)
            .median()
            .to_numpy()
        )
        df = df.assign(med2x=np.rint(med * 2.0).astype(np.int64))
        out = (
            df.groupby("user_id", sort=False)
            .agg(n_events=("med2x", "size"), max_med2x=("med2x", "max"))
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    slimmed = ds.map_batches(slim, batch_format="pyarrow", batch_size=65536)
    out = hash_aggregate(slimmed, ["user_id"], roll)
    return collect_sorted(out, ["user_id"])


SQL_ROLLING_MEDIAN = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
), w AS (
  SELECT user_id,
         CAST(ROUND(2 * median(c) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS BIGINT) AS med2x
  FROM e
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(med2x) AS max_med2x
FROM w GROUP BY user_id
"""


ORACLE_QUERIES["cusum_shift"] = (q_cusum_shift, SQL_CUSUM_SHIFT)
ORACLE_QUERIES["mlm_mask"] = (q_mlm_mask, SQL_MLM_MASK)
ORACLE_QUERIES["line_flag_patterns"] = (
    q_line_flag_patterns,
    SQL_LINE_FLAG_PATTERNS,
)
ORACLE_QUERIES["rolling_median"] = (q_rolling_median, SQL_ROLLING_MEDIAN)
