"""Wave-41: BM25 ranked retrieval.

``bm25_top_docs`` certifies the distributed BM25 composition
(:func:`pynomaly_ray.stages.text.bm25_topk`) value-for-value against a
DuckDB twin built from the SAME expression tree (same literal
placement, same association order, same whitespace tokenizer), with
the float score surfaced as a 1e-6-scaled integer so IEEE-identical
doubles hash-match.  The engine never builds the full inverted index
for a query: the tokenize pass projects posting rows for the query
terms only, N/avgdl fold from one partial row per block, df from a
|Q|-group exchange, and the top-k needs no global sort — the
ranked-retrieval shape that stays shuffle-light at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq

_TERMS = ["batch", "filter", "join", "stream"]


# ---------------------------------------------------------------------------
# Q: bm25_top_docs — top-20 documents by BM25(k1=1.2, b=0.75) for a
# fixed 4-term query over the documents table.
# ---------------------------------------------------------------------------
def q_bm25_top_docs(sf_dir: str):
    from pynomaly_ray.stages.text import bm25_topk

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    out = bm25_topk(docs, _TERMS, k=20)
    return pd.DataFrame(
        {
            "doc_id": out["doc_id"].to_numpy(dtype=np.int64),
            "score_e6": np.floor(
                out["score"].to_numpy(dtype=np.float64) * 1e6 + 0.5
            ).astype(np.int64),
        }
    )


SQL_BM25_TOP_DOCS = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(COALESCE(text, ''),
                                   '[^ \t\n\r\f\v]+')) AS token
  FROM documents),
len AS (
  SELECT d.doc_id, COALESCE(t.n, 0) AS len
  FROM documents d
  LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id) t
    USING (doc_id)),
stats AS (SELECT COUNT(*) AS n_docs, SUM(len) AS sum_len FROM len),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok
  WHERE token IN ('batch', 'filter', 'join', 'stream')
  GROUP BY doc_id, token),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
sc AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf * (1.2 + 1.0))
             / (tf.tf + 1.2 * (1.0 - 0.75
                               + 0.75 * len.len
                                 / (CAST(s.sum_len AS DOUBLE) / s.n_docs))))
           AS score
  FROM tf
  JOIN df USING (token)
  JOIN len USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id)
SELECT doc_id, CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) AS score_e6
FROM sc ORDER BY score DESC, doc_id LIMIT 20
"""

ORACLE_QUERIES["bm25_top_docs"] = (q_bm25_top_docs, SQL_BM25_TOP_DOCS)
