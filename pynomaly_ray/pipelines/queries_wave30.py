"""Wave-30: vocabulary construction and OOV profiling — the
tokenizer-adjacent corpus ops.

- ``vocab_build`` — frequency-ranked vocabulary with deterministic id
  assignment: one keyed exchange counts every token (map-side partials,
  per-bucket local top-K so only K rows per bucket ever reach the
  driver — the global top-K is necessarily inside the union of bucket
  top-Ks because buckets partition the token space), then ids are
  ranks over (count DESC, token ASC).  The BPE-trainer front half: at
  100 TB the exchange volume is the distinct-token count, not the
  corpus.
- ``oov_rates`` — per-source out-of-vocabulary occurrence counts
  against the top-K of that same vocabulary, via a BROADCAST membership
  set (the vocab is tiny by construction, so no second shuffle): the
  coverage metric that decides whether a tokenizer fits a new crawl
  source.  Integer surface (n_tokens, n_oov) — the rate is a division
  at read time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq

_VOCAB_K = 1000
_OOV_K = 20
_TOKEN_RE = r"[^ \t\n\r\f\v]+"


def _token_counts_topk(sf_dir: str, k: int) -> pd.DataFrame:
    """(token, cnt) for the k most frequent tokens, ties token-ASC."""
    ds = _pq(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas().fillna("")
        counts = (
            s.str.findall(_TOKEN_RE).explode().dropna().value_counts()
        )
        return _from_pandas(
            pd.DataFrame(
                {
                    "token": counts.index,
                    "cnt": counts.to_numpy(dtype=np.int64),
                }
            )
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False)["cnt"].sum().reset_index()
        return g.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(k)

    merged = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"], merge
    )
    df = merged.to_pandas()
    if df.empty or "token" not in df.columns:
        return pd.DataFrame(
            {
                "token": pd.Series(dtype=object),
                "cnt": pd.Series(dtype=np.int64),
            }
        )
    return (
        df.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        )
        .head(k)
        .reset_index(drop=True)
    )


def q_vocab_build(sf_dir: str):
    df = _token_counts_topk(sf_dir, _VOCAB_K)
    df = df.copy()
    df["token_id"] = np.arange(1, len(df) + 1, dtype=np.int64)
    df["cnt"] = df["cnt"].astype(np.int64)
    return df[["token_id", "token", "cnt"]]


SQL_VOCAB_BUILD = rf"""
SELECT token_id, token, cnt FROM (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT)
           AS token_id,
         token, CAST(cnt AS BIGINT) AS cnt
  FROM (
    SELECT token, COUNT(*) AS cnt FROM (
      SELECT unnest(regexp_extract_all(text, '{_TOKEN_RE}')) AS token
      FROM documents
    ) GROUP BY token
  )
)
WHERE token_id <= {_VOCAB_K}
ORDER BY token_id
"""

ORACLE_QUERIES["vocab_build"] = (q_vocab_build, SQL_VOCAB_BUILD)


def q_oov_rates(sf_dir: str):
    vocab = set(_token_counts_topk(sf_dir, _OOV_K)["token"])
    ds = _pq(sf_dir, "documents", ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        flat = pd.Series(
            [w for lst in toks for w in lst], dtype=object
        )
        oov_flat = (~flat.isin(vocab)).to_numpy(dtype=np.int64)
        src = np.repeat(df["source"].to_numpy(), lens)
        g = (
            pd.DataFrame(
                {
                    "source": src,
                    "one": np.ones(len(src), dtype=np.int64),
                    "oov": oov_flat,
                }
            )
            .groupby("source", sort=False)
            .agg(n_tokens=("one", "sum"), n_oov=("oov", "sum"))
            .reset_index()
        )
        return _from_pandas(g)

    out = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"],
        lambda df: df.groupby("source", sort=False).sum().reset_index(),
    )
    df = out.to_pandas()
    if df.empty or "source" not in df.columns:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_tokens": pd.Series(dtype=np.int64),
                "n_oov": pd.Series(dtype=np.int64),
            }
        )
    df["n_tokens"] = df["n_tokens"].astype(np.int64)
    df["n_oov"] = df["n_oov"].astype(np.int64)
    return (
        df[["source", "n_tokens", "n_oov"]]
        .sort_values("source", kind="mergesort")
        .reset_index(drop=True)
    )


SQL_OOV_RATES = rf"""
WITH tok AS (
  SELECT source,
         unnest(regexp_extract_all(text, '{_TOKEN_RE}')) AS token
  FROM documents
),
vocab AS (
  SELECT token FROM (
    SELECT token,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rn
    FROM tok GROUP BY token
  ) WHERE rn <= {_OOV_K}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN token IN (SELECT token FROM vocab)
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
FROM tok
GROUP BY source
ORDER BY source
"""

ORACLE_QUERIES["oov_rates"] = (q_oov_rates, SQL_OOV_RATES)
