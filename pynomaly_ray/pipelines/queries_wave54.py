"""Wave-54: id-stable vocabulary evolution and integer-scaled PPMI
collocations — tokenizer-lifecycle operators certified against DuckDB.

``vocab_evolve`` — the dictionary-evolution contract every deployed
tokenizer needs: run 1 builds a top-20 frequency vocabulary on the
even-doc_id half of the corpus; the evolved vocabulary over the FULL
corpus must keep every run-1 id STABLE (re-encoding old data stays
valid) and append new tokens after the old max id, ranked by full
count.  Engine shape: two token-count exchanges (subset + full,
map-side partials, exchange volume = distinct tokens, never corpus
tokens); ranking happens on the vocabulary-sized result (a dim
surface).  The SQL twin reproduces both rankings and the COALESCE
id assignment.

``ppmi_pairs`` — pointwise-mutual-information collocations with NO
float: score_e3 = (cnt_ab * total_tokens * 1000) // (cnt_a * cnt_b),
the monotone integer image of PMI on the e3 grid (bigram_collocations
ranks by raw count; PPMI surfaces pairs that co-occur more than their
unigram frequencies predict — the classic collocation measure).  Pairs
below 3 occurrences are dropped.  Unigram counts broadcast as a
vocab-sized dict; bigram scoring happens inside the bucket reducers;
only top-k rows reach the driver.  The triple product stays in int64
up to ~10^9-token corpora; past that the factors need a wider grid
(the SQL twin already computes in HUGEINT).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import hash_aggregate, topk
from pynomaly_ray.pipelines.queries import (
    ORACLE_QUERIES,
    _ASCII_TOKEN_RE,
    _from_pandas,
    _pq,
)

_V1_K = 20  # run-1 vocabulary size
_PPMI_K = 10
_PPMI_MIN = 3


def _token_counts(sf_dir: str, even_only: bool) -> pd.DataFrame:
    cols = ["doc_id", "text"] if even_only else ["text"]
    ds = _pq(sf_dir, "documents", cols)

    def partial(batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas().fillna("")
        if even_only:
            keep = (
                batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                % 2
                == 0
            )
            s = s[keep]
        counts = s.str.findall(_ASCII_TOKEN_RE).explode().dropna().value_counts()
        return _from_pandas(
            pd.DataFrame(
                {"token": counts.index, "cnt": counts.to_numpy(np.int64)}
            )
        )

    out = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token"],
        lambda df: df.groupby("token", sort=False)["cnt"].sum().reset_index(),
    ).to_pandas()  # vocabulary-sized (distinct tokens), never corpus rows
    if out.empty or "token" not in out.columns:
        return pd.DataFrame(
            {"token": pd.Series(dtype=object), "cnt": pd.Series(dtype=np.int64)}
        )
    return out


def q_vocab_evolve(sf_dir: str):
    run1 = _token_counts(sf_dir, even_only=True)
    full = _token_counts(sf_dir, even_only=False)
    old = (
        run1.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
        .head(_V1_K)
        .reset_index(drop=True)
    )
    old_ids = {t: i + 1 for i, t in enumerate(old["token"])}
    full = full.sort_values(
        ["cnt", "token"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    is_new = ~full["token"].isin(old_ids)
    new_rank = np.cumsum(is_new.to_numpy())
    token_id = np.where(
        is_new.to_numpy(),
        len(old_ids) + new_rank,
        full["token"].map(old_ids).fillna(0).to_numpy(),
    ).astype(np.int64)
    out = pd.DataFrame(
        {
            "token_id": token_id,
            "token": full["token"].to_numpy(object),
            "cnt": full["cnt"].to_numpy(np.int64),
        }
    ).sort_values("token_id", kind="mergesort").reset_index(drop=True)
    return out


SQL_VOCAB_EVOLVE = rf"""
WITH u1 AS (
  SELECT unnest(regexp_extract_all(text, '{_ASCII_TOKEN_RE}')) AS token
  FROM documents WHERE doc_id % 2 = 0
),
old AS (
  SELECT token,
         CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token)
              AS BIGINT) AS old_id
  FROM u1 GROUP BY token
  QUALIFY old_id <= {_V1_K}
),
uf AS (
  SELECT unnest(regexp_extract_all(text, '{_ASCII_TOKEN_RE}')) AS token
  FROM documents
),
full_cnt AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM uf GROUP BY token
),
ranked AS (
  SELECT f.token, f.cnt, old.old_id,
         CASE WHEN old.old_id IS NULL THEN
           ROW_NUMBER() OVER (
             PARTITION BY (old.old_id IS NULL)
             ORDER BY f.cnt DESC, f.token
           )
         END AS new_rank
  FROM full_cnt f LEFT JOIN old USING (token)
)
SELECT CAST(COALESCE(old_id,
            (SELECT COUNT(*) FROM old) + new_rank) AS BIGINT) AS token_id,
       token, cnt
FROM ranked
ORDER BY token_id
"""


def q_ppmi_pairs(sf_dir: str):
    uni = _token_counts(sf_dir, even_only=False)
    uni_map = dict(zip(uni["token"], uni["cnt"].astype(int)))
    total = int(uni["cnt"].sum())

    ds = _pq(sf_dir, "documents", ["text"])

    def pairs(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").astype(str)
        toks = s.str.findall(_ASCII_TOKEN_RE)
        w1: list = []
        w2: list = []
        for w in toks:
            if len(w) > 1:
                arr = np.asarray(w, dtype=object)
                w1.append(arr[:-1])
                w2.append(arr[1:])
        if not w1:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        g = (
            pd.DataFrame({"w1": np.concatenate(w1), "w2": np.concatenate(w2)})
            .groupby(["w1", "w2"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "w1": pd.Series(dtype=object),
                    "w2": pd.Series(dtype=object),
                    "c_ab": pd.Series(dtype=np.int64),
                    "score_e3": pd.Series(dtype=np.int64),
                }
            )
        g = df.groupby(["w1", "w2"], sort=False)["cnt"].sum().reset_index()
        g = g[g["cnt"] >= _PPMI_MIN]
        if g.empty:
            return pd.DataFrame(
                {
                    "w1": pd.Series(dtype=object),
                    "w2": pd.Series(dtype=object),
                    "c_ab": pd.Series(dtype=np.int64),
                    "score_e3": pd.Series(dtype=np.int64),
                }
            )
        ca = g["w1"].map(uni_map).to_numpy(np.int64)
        cb = g["w2"].map(uni_map).to_numpy(np.int64)
        cab = g["cnt"].to_numpy(np.int64)
        score_e3 = (cab * np.int64(total) * np.int64(1000)) // (ca * cb)
        return pd.DataFrame(
            {
                "w1": g["w1"].to_numpy(object),
                "w2": g["w2"].to_numpy(object),
                "c_ab": cab,
                "score_e3": score_e3,
            }
        )

    scored = hash_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"), ["w1", "w2"], score
    )
    out = topk(
        scored, ["score_e3", "w1", "w2"], _PPMI_K, descending=[True, False, False]
    )
    for c in ("c_ab", "score_e3"):
        out[c] = out[c].astype(np.int64)
    return out[["w1", "w2", "c_ab", "score_e3"]]


SQL_PPMI_PAIRS = rf"""
WITH w AS (
  SELECT regexp_extract_all(text, '{_ASCII_TOKEN_RE}') AS ws
  FROM documents
),
u AS (SELECT unnest(ws) AS token FROM w),
uni AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY token),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM u),
i AS (
  SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w
),
pb AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM i GROUP BY w1, w2
  HAVING COUNT(*) >= {_PPMI_MIN}
)
SELECT pb.w1, pb.w2, pb.c_ab,
       CAST((pb.c_ab::HUGEINT * tot.t * 1000)
            // (ua.c::HUGEINT * ub.c) AS BIGINT) AS score_e3
FROM pb
JOIN uni ua ON ua.token = pb.w1
JOIN uni ub ON ub.token = pb.w2
CROSS JOIN tot
ORDER BY score_e3 DESC, pb.w1, pb.w2
LIMIT {_PPMI_K}
"""


ORACLE_QUERIES["vocab_evolve"] = (q_vocab_evolve, SQL_VOCAB_EVOLVE)
ORACLE_QUERIES["ppmi_pairs"] = (q_ppmi_pairs, SQL_PPMI_PAIRS)
