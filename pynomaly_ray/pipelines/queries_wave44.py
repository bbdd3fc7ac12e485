"""Wave-44: DSIR-style n-gram importance weighting for data selection.

``dsir_weights`` — the Data Selection via Importance Resampling shape
(Xie et al. 2023, arXiv:2302.03169) with an integer-exact surface: a
TARGET domain (here ``source = 'src0'`` — stand-in for "the
high-quality corpus you want more of") defines a unigram profile; every
document is scored by how target-like its word distribution is.

Engine shape (two corpus passes, no joins wider than the profile):

1. ONE tokenize pass emits per-word ``(corpus_count, target_count)``
   partials (target counted with a vectorized source mask — no second
   pass for the target side), merged by a keyed exchange; the driver
   keeps the top-``V`` profile rows (per-bucket top-V first, so only
   V rows per bucket travel).  The profile is the DSIR feature table:
   bounded at ``V`` regardless of corpus size.
2. ONE scoring pass: per batch, words are exploded, mapped through the
   broadcast ratio dict (``target*1e6 // corpus`` — integer division,
   exact in SQL as a BIGINT expression), summed per document with
   ``np.add.at``.  At 100 TB the profile rides ``ray.put`` once; here
   it rides the closure (tiny).

Real DSIR hashes n-grams into buckets and scores with log-ratios; the
hashed variant is this exact pipeline with ``word -> hash(word) % B``
on both passes (the exchange key changes, nothing else), and logs are a
per-row map.  The word-keyed integer-ratio form is chosen so the WHOLE
pipeline — profile cutoff, tie-breaks, per-doc sum — is certified
hash-exact against a DuckDB twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq

_TOKEN_RE = r"[^ \t\n\r\f\v]+"
_TARGET_SOURCE = "src0"
_PROFILE_V = 1000
_SCALE = 1_000_000


def _profile(sf_dir: str) -> dict[str, int]:
    """word -> integer ratio (target_cnt * 1e6 // corpus_cnt), top-V
    words by (corpus_cnt DESC, word ASC)."""
    ds = _pq(sf_dir, "documents", ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        flat = pd.Series([w for lst in toks for w in lst], dtype=object)
        is_target = (
            df["source"].to_numpy() == _TARGET_SOURCE
        ).astype(np.int64)
        tgt = np.repeat(is_target, lens)
        g = (
            pd.DataFrame({"word": flat, "c": 1, "t": tgt})
            .groupby("word", sort=False)
            .agg(c=("c", "sum"), t=("t", "sum"))
            .reset_index()
        )
        return pa.Table.from_pydict(
            {
                "word": g["word"].to_numpy(dtype=object),
                "c": g["c"].to_numpy(dtype=np.int64),
                "t": g["t"].to_numpy(dtype=np.int64),
            }
        )

    def topv(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", sort=False)[["c", "t"]].sum().reset_index()
        return g.sort_values(
            ["c", "word"], ascending=[False, True], kind="mergesort"
        ).head(_PROFILE_V)

    prof = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["word"], topv
    ).to_pandas()
    if prof.empty or "word" not in prof.columns:
        return {}
    prof = prof.sort_values(
        ["c", "word"], ascending=[False, True], kind="mergesort"
    ).head(_PROFILE_V)
    ratio = (
        prof["t"].to_numpy(dtype=np.int64) * _SCALE
        // prof["c"].to_numpy(dtype=np.int64)
    )
    return dict(zip(prof["word"], (int(r) for r in ratio)))


def q_dsir_weights(sf_dir: str):
    ratios = _profile(sf_dir)
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        flat = pd.Series([w for lst in toks for w in lst], dtype=object)
        r = flat.map(ratios).fillna(0).to_numpy(dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), lens)
        s = np.zeros(len(df), dtype=np.int64)
        if len(doc_idx):
            np.add.at(s, doc_idx, r)
        return pa.Table.from_pydict(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "dsir_score": s,
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


SQL_DSIR_WEIGHTS = rf"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(regexp_extract_all(text, '{_TOKEN_RE}')) AS word
  FROM documents
),
profile AS (
  SELECT word,
         CAST(SUM(CASE WHEN source = '{_TARGET_SOURCE}' THEN 1 ELSE 0 END)
              * {_SCALE} AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS ratio
  FROM tok
  GROUP BY word
  ORDER BY COUNT(*) DESC, word
  LIMIT {_PROFILE_V}
)
SELECT d.doc_id,
       CAST(COALESCE(SUM(p.ratio), 0) AS BIGINT) AS dsir_score
FROM documents d
LEFT JOIN tok ON tok.doc_id = d.doc_id
LEFT JOIN profile p ON p.word = tok.word
GROUP BY d.doc_id
ORDER BY d.doc_id
"""

ORACLE_QUERIES["dsir_weights"] = (q_dsir_weights, SQL_DSIR_WEIGHTS)
