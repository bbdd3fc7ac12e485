"""Wave-48: T5-style span corruption and deterministic source
interleaving — two training-data construction operators whose OUTPUT
STRINGS / global order are certified byte-exact against DuckDB twins.

``span_corrupt`` — seq-to-seq denoising corruption (T5): the token
stream of every sampled doc (doc_id % 17 == 5) is cut into fixed
5-token windows; a window is masked iff
``(doc_id*1000003 + win*10007) % 100 < 20``; inside a masked window
the 2nd token is replaced by an ``<extra_id_k>`` sentinel (k = the
doc-ordered index of emitting windows) and the 3rd token is dropped.
The corruption is a pure function of (doc_id, position) — one
map_batches pass, no exchange, read-bandwidth at 100 TB — and the
CORRUPTED STRING ITSELF hash-matches the SQL twin, the strongest check
a corruption pipeline admits (a reproducibility requirement for
training-corpus builds).  Windows shorter than 2 tokens emit no
sentinel; docs with zero tokens are dropped (unnest semantics).

``interleave_sources`` — deterministic epoch-order construction: docs
are round-robin interleaved across sources (global order =
within-source rank * n_sources + source index), the order every
mixture dataloader needs to be reproducible across engines and runs.
One keyed exchange ranks within source; the source->index map is a
broadcast dim (sources are a partition-level dimension, never
corpus-sized); the first 50 rows of the global order are certified.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    collect_sorted,
    hash_aggregate,
    topk,
)
from pynomaly_ray.pipelines.queries import (
    ORACLE_QUERIES,
    _ASCII_TOKEN_RE,
    _pq,
)

_SPAN_A = 1_000_003
_SPAN_B = 10_007
_SPAN_PCT = 20
_SPAN_MOD = 17  # doc sample: doc_id % 17 == 5
_SPAN_RES = 5
_WIN = 5  # window width (tokens)
_ILV_K = 50  # interleave rows certified


def q_span_corrupt(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def corrupt(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["doc_id"] % _SPAN_MOD == _SPAN_RES]
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_spans": pa.array([], pa.int64()),
                "corrupted": pa.array([], pa.string()),
            }
        )
        if df.empty:
            return empty
        toks = df["text"].fillna("").str.findall(_ASCII_TOKEN_RE)
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
        win = idx // _WIN
        off = idx % _WIN
        masked = (doc_ids[rep] * _SPAN_A + win * _SPAN_B) % 100 < _SPAN_PCT
        sel = masked & (off == 1)  # sentinel position
        drop = masked & (off == 2)  # dropped position
        # doc-ordered sentinel index k: running count of sel within doc
        c = np.cumsum(sel)
        base = c[starts] - sel[starts]
        k = (c - 1 - base[rep])[sel]
        pieces = flat.copy()
        pieces[sel] = np.asarray(
            [f"<extra_id_{int(v)}>" for v in k], dtype=object
        )
        n_spans = np.bincount(
            rep, weights=sel, minlength=len(doc_ids)
        ).astype(np.int64)
        keep_rows = ~drop
        corrupted = (
            pd.Series(pieces[keep_rows], dtype=object)
            .groupby(rep[keep_rows])
            .agg(" ".join)
            .to_numpy()
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_spans": pa.array(n_spans, pa.int64()),
                "corrupted": pa.array(corrupted, pa.string()),
            }
        )

    out = ds.map_batches(corrupt, batch_format="pyarrow", batch_size=16384)
    return collect_sorted(out, ["doc_id"])


SQL_SPAN_CORRUPT = rf"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '{_ASCII_TOKEN_RE}') AS toks
  FROM documents WHERE doc_id % {_SPAN_MOD} = {_SPAN_RES}
), u AS (
  SELECT doc_id, unnest(toks) AS tok, unnest(range(len(toks))) AS idx
  FROM d
), t AS (
  SELECT doc_id, tok, idx, idx % {_WIN} AS off,
         CASE WHEN (doc_id * {_SPAN_A} + (idx // {_WIN}) * {_SPAN_B})
                   % 100 < {_SPAN_PCT}
              THEN 1 ELSE 0 END AS m
  FROM u
), t2 AS (
  SELECT *, CASE WHEN m = 1 AND off = 1 THEN 1 ELSE 0 END AS sel
  FROM t
), t3 AS (
  SELECT *, SUM(sel) OVER (PARTITION BY doc_id ORDER BY idx) AS cum
  FROM t2
), p AS (
  SELECT doc_id, idx, sel,
         CASE WHEN sel = 1
              THEN '<extra_id_' || CAST(cum - 1 AS VARCHAR) || '>'
              ELSE tok END AS piece
  FROM t3
  WHERE NOT (m = 1 AND off = 2)
)
SELECT doc_id,
       CAST(SUM(sel) AS BIGINT) AS n_spans,
       string_agg(piece, ' ' ORDER BY idx) AS corrupted
FROM p GROUP BY doc_id ORDER BY doc_id
"""


def q_interleave_sources(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["doc_id", "source"])

    # the source dim: distinct names -> dense index (broadcast surface)
    def src_partial(t: pa.Table) -> pa.Table:
        u = pa.table({"source": t["source"].combine_chunks().unique()})
        return u

    srcs = sorted(
        set(
            ds.map_batches(src_partial, batch_format="pyarrow")
            .to_pandas()["source"]
            .tolist()
        )
    )
    si = {s: i for i, s in enumerate(srcs)}
    n_src = len(srcs)

    def rank_and_order(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "ord": pd.Series(dtype=np.int64),
                    "doc_id": pd.Series(dtype=np.int64),
                    "source": pd.Series(dtype=object),
                }
            )
        d = df.sort_values(["source", "doc_id"], kind="mergesort")
        r = d.groupby("source", sort=False).cumcount().to_numpy(np.int64)
        sidx = d["source"].map(si).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "ord": r * n_src + sidx,
                "doc_id": d["doc_id"].to_numpy(np.int64),
                "source": d["source"].to_numpy(object),
            }
        )

    ranked = hash_aggregate(ds, ["source"], rank_and_order)
    out = topk(ranked, ["ord"], _ILV_K, descending=[False])
    out["ord"] = out["ord"].astype(np.int64)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["ord", "doc_id", "source"]]


SQL_INTERLEAVE_SOURCES = f"""
WITH m AS (
  SELECT source,
         CAST(DENSE_RANK() OVER (ORDER BY source) - 1 AS BIGINT) AS si
  FROM (SELECT DISTINCT source FROM documents)
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_src FROM m),
r AS (
  SELECT source, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1
              AS BIGINT) AS rk
  FROM documents
)
SELECT r.rk * n.n_src + m.si AS ord, r.doc_id, r.source
FROM r JOIN m USING (source) CROSS JOIN n
ORDER BY ord
LIMIT {_ILV_K}
"""


ORACLE_QUERIES["span_corrupt"] = (q_span_corrupt, SQL_SPAN_CORRUPT)
ORACLE_QUERIES["interleave_sources"] = (
    q_interleave_sources,
    SQL_INTERLEAVE_SOURCES,
)
