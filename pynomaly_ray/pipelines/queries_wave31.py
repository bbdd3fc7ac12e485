"""Wave-31: per-source token diversity.

``token_diversity`` — per source: distinct token types, total token
occurrences, and the collision mass Σ cnt² (the integer numerator of
the Simpson diversity index: the probability two random tokens from the
source coincide is Σcnt²/(Σcnt)², and type-token ratio is
n_types/n_tokens — both divisions happen at read time, keeping the
oracle surface integer-exact).  Corpus curation uses this to spot
low-diversity (template/boilerplate-heavy) sources before they skew a
training mix.

Engine shape: ONE (source, token)-keyed exchange — map-side partials
collapse each batch to its (source, token) counts, bucket reducers
re-collapse across batches, and the per-source fold (types / tokens /
Σcnt²) happens INSIDE the same reducers, so only #sources rows leave
the exchange.  Exchange volume is the distinct (source, token) count,
never the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    collect_sorted,
    hash_aggregate,
)
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq

_TOKEN_RE = r"[^ \t\n\r\f\v]+"


def q_token_diversity(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        flat = pd.Series([w for lst in toks for w in lst], dtype=object)
        src = np.repeat(df["source"].to_numpy(), lens)
        g = (
            pd.DataFrame({"source": src, "token": flat.to_numpy()})
            .groupby(["source", "token"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return _from_pandas(g)

    # the exchange is keyed on source ALONE so a source's full token
    # distribution co-locates in one reducer — the per-source fold
    # (distinct types, Σcnt, Σcnt²) then happens inside that reducer
    # and only #sources rows ever leave the exchange.  Token counts
    # for one (source, token) may arrive as several partials (one per
    # batch), so the reducer re-collapses before squaring.
    def fold(df: pd.DataFrame) -> pd.DataFrame:
        c = (
            df.groupby(["source", "token"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        c["sq"] = c["cnt"] * c["cnt"]
        return (
            c.groupby("source", sort=False)
            .agg(
                n_types=("token", "size"),
                n_tokens=("cnt", "sum"),
                collision_mass=("sq", "sum"),
            )
            .reset_index()
        )

    out = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["source"], fold
    )
    df = collect_sorted(out, ["source"])
    if df.empty or "source" not in df.columns:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_types": pd.Series(dtype=np.int64),
                "n_tokens": pd.Series(dtype=np.int64),
                "collision_mass": pd.Series(dtype=np.int64),
            }
        )
    for c in ("n_types", "n_tokens", "collision_mass"):
        df[c] = df[c].astype(np.int64)
    return df[["source", "n_types", "n_tokens", "collision_mass"]]


SQL_TOKEN_DIVERSITY = rf"""
WITH tok AS (
  SELECT source,
         unnest(regexp_extract_all(text, '{_TOKEN_RE}')) AS token
  FROM documents
),
c AS (
  SELECT source, token, COUNT(*) AS cnt
  FROM tok GROUP BY source, token
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       CAST(SUM(cnt * cnt) AS BIGINT) AS collision_mass
FROM c
GROUP BY source
ORDER BY source
"""

ORACLE_QUERIES["token_diversity"] = (q_token_diversity, SQL_TOKEN_DIVERSITY)
