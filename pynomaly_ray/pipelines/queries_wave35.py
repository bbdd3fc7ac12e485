"""Wave-35 capstone: a composed curation pipeline, oracle-checked
end-to-end.

``curated_source_stats`` — the canonical pre-training curation chain as
ONE streaming pipeline: Gopher-style quality filter (wave-26 rules,
applied vectorized inside the scan so rejected docs never leave it) →
exact content dedup keeping the LOWEST doc_id per distinct text (one
int64-content-hash exchange; equal texts co-locate by hash and the
min-id winner is picked on the EXACT text inside the bucket reducer, so
a hash collision can never conflate two texts) → per-source survivor
counts and char sums (folded inside the same reducers; only #sources
rows leave the second exchange).  The DuckDB twin expresses the same
chain as CTEs, so the hash comparison certifies the COMPOSITION —
filter semantics, keep-first tie-break, and the aggregate — not just
each stage in isolation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted, hash_aggregate
from pynomaly_ray.functions.hashing import hash_strings, nul_safe_key
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq
from pynomaly_ray.pipelines.queries_wave26 import (
    _GQ_LEN_DEN,
    _GQ_LEN_NUM_HI,
    _GQ_LEN_NUM_LO,
    _GQ_MAX_WORDS,
    _GQ_MIN_WORDS,
    _GQ_STOPWORDS,
    _TOKEN_RE,
    _WS_CLASS,
)


def q_curated_source_stats(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["doc_id", "source", "text", "n_chars"])
    stop_re = (
        r"(?:^|" + _WS_CLASS + r")(?:" + "|".join(_GQ_STOPWORDS) + r")"
        r"(?=" + _WS_CLASS + r"|$)"
    )

    def filter_and_hash(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        texts = df["text"].fillna("")
        n_words = texts.str.count(_TOKEN_RE).astype(np.int64)
        wchars = (texts.str.len() - texts.str.count(_WS_CLASS)).astype(
            np.int64
        )
        ok = (
            (n_words >= _GQ_MIN_WORDS)
            & (n_words <= _GQ_MAX_WORDS)
            & (_GQ_LEN_NUM_LO * n_words <= _GQ_LEN_DEN * wchars)
            & (_GQ_LEN_DEN * wchars <= _GQ_LEN_NUM_HI * n_words)
            & texts.str.contains(stop_re, regex=True)
        )
        kept = df[ok.to_numpy()].copy()
        kept["h"] = hash_strings(kept["text"].fillna("")).astype(np.int64)
        return _from_pandas(
            kept[["h", "text", "doc_id", "source", "n_chars"]]
        )

    filtered = ds.map_batches(filter_and_hash, batch_format="pyarrow")

    def keep_first_fold(df: pd.DataFrame) -> pd.DataFrame:
        # equal texts co-locate by hash; pick the min-doc_id row per
        # EXACT text (NUL-safe key so hostile text can't alias), then
        # fold the survivors to per-source partials inside the bucket
        df = df.assign(_t=nul_safe_key(df["text"]))
        idx = df.groupby("_t", sort=False)["doc_id"].idxmin()
        kept = df.loc[idx]
        return (
            kept.groupby("source", sort=False)
            .agg(n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum"))
            .reset_index()
        )

    partials = hash_aggregate(filtered, ["h"], keep_first_fold)
    out = hash_aggregate(
        partials,
        ["source"],
        lambda df: df.groupby("source", sort=False).sum().reset_index(),
    )
    df = collect_sorted(out, ["source"])
    if df.empty or "source" not in df.columns:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_docs": pd.Series(dtype=np.int64),
                "sum_chars": pd.Series(dtype=np.int64),
            }
        )
    df["n_docs"] = df["n_docs"].astype(np.int64)
    df["sum_chars"] = df["sum_chars"].astype(np.int64)
    return df[["source", "n_docs", "sum_chars"]]


SQL_CURATED_SOURCE_STATS = rf"""
WITH q AS (
  SELECT doc_id, source, n_chars, text,
         length(regexp_extract_all(text, '{_TOKEN_RE}')) AS n_words,
         length(regexp_replace(text, '{_WS_CLASS}', '', 'g')) AS wchars
  FROM documents
),
f AS (
  SELECT doc_id, source, n_chars, text FROM q
  WHERE n_words BETWEEN {_GQ_MIN_WORDS} AND {_GQ_MAX_WORDS}
    AND {_GQ_LEN_NUM_LO} * n_words <= {_GQ_LEN_DEN} * wchars
    AND {_GQ_LEN_DEN} * wchars <= {_GQ_LEN_NUM_HI} * n_words
    AND len(list_filter(regexp_extract_all(text, '{_TOKEN_RE}'),
                        x -> x IN ('the', 'and', 'of', 'to', 'in'))) > 0
),
d AS (SELECT MIN(doc_id) AS keep_id FROM f GROUP BY text)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM f JOIN d ON f.doc_id = d.keep_id
GROUP BY source
ORDER BY source
"""

ORACLE_QUERIES["curated_source_stats"] = (
    q_curated_source_stats,
    SQL_CURATED_SOURCE_STATS,
)
