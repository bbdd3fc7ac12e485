"""Wave-57: time-weighted value integration and the Heaps-law
vocabulary growth curve.

``time_weighted_value`` — the step-function integral every
position/price/telemetry store needs: each event's value holds until
the user's next event, so the duration-weighted numerator is
``sum(value_cents * dt_seconds)`` (integer grid: cents x floored
whole seconds — exact on both sides, and bounded far inside int64
where a microsecond x e6 grid would overflow).  Per user: the
integral numerator, the covered seconds, and the event count.  One
keyed exchange; the per-user series never leaves its bucket (shifted
diff, no window materialization).

``vocab_growth`` — the Heaps'-law curve of the corpus: at 10 doc-id
cutoffs (k/10 of max(doc_id)+1), how many distinct tokens and total
tokens the prefix has seen.  Engine shape: one token exchange reduces
each token to its FIRST doc (min), after which the curve is a
vocabulary-sized histogram; total-token counts fold map-side per
cutoff.  The distinct-so-far curve is what tokenizer-budget planning
reads; no per-cutoff distinct scan ever runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted, hash_aggregate
from pynomaly_ray.pipelines.queries import (
    ORACLE_QUERIES,
    _ASCII_TOKEN_RE,
    _from_pandas,
    _pq,
)

_N_CUTS = 10


def q_time_weighted_value(sf_dir: str):
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["value"].notna()]
        df["ts_us"] = df.pop("ts").astype("int64")
        df["cents"] = np.floor(
            df.pop("value").to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return _from_pandas(df)

    def integrate(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype=np.int64),
                    "num_cents_s": pd.Series(dtype=np.int64),
                    "dur_s": pd.Series(dtype=np.int64),
                    "n_events": pd.Series(dtype=np.int64),
                }
            )
        d = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = d["user_id"].to_numpy(np.int64)
        ts = d["ts_us"].to_numpy(np.int64)
        cents = d["cents"].to_numpy(np.int64)
        same_next = np.r_[uid[1:] == uid[:-1], False]
        dt_s = np.where(
            same_next, np.r_[np.diff(ts), np.int64(0)] // 1_000_000, 0
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "user_id": uid,
                    "num": cents * dt_s,
                    "dur": dt_s,
                }
            )
            .groupby("user_id", sort=False)
            .agg(
                num_cents_s=("num", "sum"),
                dur_s=("dur", "sum"),
                n_events=("num", "size"),
            )
            .reset_index()
        )
        return g

    out = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"), ["user_id"], integrate
    )
    df = collect_sorted(out, ["user_id"])
    for c in ("user_id", "num_cents_s", "dur_s", "n_events"):
        df[c] = df[c].astype(np.int64)
    return df[["user_id", "num_cents_s", "dur_s", "n_events"]]


SQL_TIME_WEIGHTED_VALUE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT user_id, cents,
         COALESCE(LEAD(ts_us) OVER (
           PARTITION BY user_id ORDER BY ts_us
         ) - ts_us, 0) // 1000000 AS dt_s
  FROM e
)
SELECT user_id,
       CAST(SUM(cents * dt_s) AS BIGINT) AS num_cents_s,
       CAST(SUM(dt_s) AS BIGINT) AS dur_s,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM w GROUP BY user_id ORDER BY user_id
"""


def q_vocab_growth(sf_dir: str):
    import os

    import pyarrow.parquet as papq

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    # max(doc_id) from footer statistics scale: one tiny column read
    max_id = int(
        papq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )["doc_id"]
        .to_pandas()
        .max()
    )
    n = max_id + 1
    cuts = np.array([(k * n) // _N_CUTS for k in range(1, _N_CUTS + 1)])

    def pairs(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").astype(str)
        toks = s.str.findall(_ASCII_TOKEN_RE)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = toks.str.len().to_numpy(np.int64)
        # per-cutoff total-token partials fold right here (map side)
        tot = np.array(
            [lens[did < c].sum() for c in cuts], dtype=np.int64
        )
        flat = [w for lst in toks for w in lst]
        rep = np.repeat(did, lens)
        firsts = (
            pd.DataFrame({"token": flat, "first_doc": rep})
            .groupby("token", sort=False)["first_doc"]
            .min()
            .reset_index()
        )
        firsts["k"] = np.int64(0)
        firsts["tot"] = np.int64(0)
        totals = pd.DataFrame(
            {
                "token": [""] * _N_CUTS,
                "first_doc": np.full(_N_CUTS, -1, np.int64),
                "k": np.arange(1, _N_CUTS + 1, dtype=np.int64),
                "tot": tot,
            }
        )
        return pa.Table.from_pandas(
            pd.concat([firsts, totals], ignore_index=True),
            preserve_index=False,
        )

    rows = hash_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["token"],
        lambda df: df,  # co-locate token partials; reduce on the driver
    ).to_pandas()
    tot_rows = rows[rows["k"] > 0]
    totals = (
        tot_rows.groupby("k", sort=True)["tot"].sum().reindex(
            range(1, _N_CUTS + 1), fill_value=0
        )
    )
    tok_rows = rows[rows["k"] == 0]
    first_doc = (
        tok_rows.groupby("token", sort=False)["first_doc"].min().to_numpy()
    )
    n_distinct = np.array(
        [(first_doc < c).sum() for c in cuts], dtype=np.int64
    )
    return pd.DataFrame(
        {
            "k": np.arange(1, _N_CUTS + 1, dtype=np.int64),
            "cutoff": cuts.astype(np.int64),
            "n_distinct": n_distinct,
            "n_tokens": totals.to_numpy(np.int64),
        }
    )


SQL_VOCAB_GROWTH = rf"""
WITH m AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
cut AS (
  SELECT k, (k * (SELECT n FROM m)) // {_N_CUTS} AS cutoff
  FROM generate_series(1, {_N_CUTS}) t(k)
),
tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '{_ASCII_TOKEN_RE}')) AS token
  FROM documents
),
firsts AS (SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY token)
SELECT CAST(cut.k AS BIGINT) AS k,
       CAST(cut.cutoff AS BIGINT) AS cutoff,
       CAST((SELECT COUNT(*) FROM firsts
             WHERE first_doc < cut.cutoff) AS BIGINT) AS n_distinct,
       CAST((SELECT COUNT(*) FROM tok WHERE doc_id < cut.cutoff)
            AS BIGINT) AS n_tokens
FROM cut ORDER BY k
"""


ORACLE_QUERIES["time_weighted_value"] = (
    q_time_weighted_value,
    SQL_TIME_WEIGHTED_VALUE,
)
ORACLE_QUERIES["vocab_growth"] = (q_vocab_growth, SQL_VOCAB_GROWTH)
