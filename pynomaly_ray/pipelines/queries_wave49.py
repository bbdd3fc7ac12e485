"""Wave-49: batch-construction padding audit and integer-exact MRR
retrieval eval — the efficiency and quality scoreboards of a training
dataloader, both certified against DuckDB twins.

``padding_waste`` — padding-efficiency audit: within each source's
shard, docs are length-sorted and cut into fixed batches of 32 (the
standard bucketed-batching recipe); a batch pads every sequence to its
max length, so waste = max*size - sum per batch.  Reported per source
as n_batches / pad_tokens / total_tokens — the number a 100-TB run
watches to choose bucket widths.  One keyed exchange (rank within
source), vectorized batch math per bucket.

``mrr_eval`` — Mean Reciprocal Rank @ 10 of label retrieval over the
wave-37 int8 code surface: for each vector, candidates rank by the
EXACT integer dot (dot DESC, cand_id ASC — enforced via a composite
int64 sort key so top-k boundary ties cannot diverge from SQL), and
the reciprocal rank of the first same-label hit in the top 10 scores
2520/rank (2520 = lcm(1..10), so every score is an integer and the
per-label SUM is hash-certifiable — no float MRR ever materializes).
Same broadcast-GEMM scale shape as ``knn_accuracy``: the exact
evaluator for an eval sample; IVF is the corpus-scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted, hash_aggregate
from pynomaly_ray.pipelines.queries import (
    ORACLE_QUERIES,
    _ASCII_TOKEN_RE,
    _pq,
)

_BATCH = 32  # padding_waste batch size
_MRR_K = 10
_MRR_SCALE = 2520  # lcm(1..10): 2520/rank is integral for rank <= 10


# ---------------------------------------------------------------------------
# padding_waste
# ---------------------------------------------------------------------------


def q_padding_waste(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["doc_id", "source", "text"])

    def pre(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("")
        n_tok = s.str.count(_ASCII_TOKEN_RE).to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "source": t["source"],
                "n_tok": pa.array(n_tok, pa.int64()),
            }
        )

    def waste(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "source": pd.Series(dtype=object),
                    "n_batches": pd.Series(dtype=np.int64),
                    "pad_tokens": pd.Series(dtype=np.int64),
                    "total_tokens": pd.Series(dtype=np.int64),
                }
            )
        d = df.sort_values(["source", "n_tok", "doc_id"], kind="mergesort")
        b = d.groupby("source", sort=False).cumcount().to_numpy(np.int64) // _BATCH
        g = (
            pd.DataFrame(
                {
                    "source": d["source"].to_numpy(object),
                    "b": b,
                    "n_tok": d["n_tok"].to_numpy(np.int64),
                }
            )
            .groupby(["source", "b"], sort=False)["n_tok"]
            .agg(mx="max", sm="sum", c="size")
            .reset_index()
        )
        g["pad"] = g["mx"] * g["c"] - g["sm"]
        return (
            g.groupby("source", sort=False)
            .agg(
                n_batches=("b", "size"),
                pad_tokens=("pad", "sum"),
                total_tokens=("sm", "sum"),
            )
            .reset_index()
        )

    out = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"), ["source"], waste
    )
    df = collect_sorted(out, ["source"])
    for c in ("n_batches", "pad_tokens", "total_tokens"):
        df[c] = df[c].astype(np.int64)
    return df[["source", "n_batches", "pad_tokens", "total_tokens"]]


SQL_PADDING_WASTE = rf"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text, '{_ASCII_TOKEN_RE}'))
              AS BIGINT) AS n_tok
  FROM documents
),
r AS (
  SELECT source, n_tok,
         (ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tok, doc_id)
          - 1) // {_BATCH} AS b
  FROM t
),
bb AS (
  SELECT source, b,
         MAX(n_tok) * COUNT(*) - SUM(n_tok) AS pad,
         SUM(n_tok) AS tok
  FROM r GROUP BY source, b
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_batches,
       CAST(SUM(pad) AS BIGINT) AS pad_tokens,
       CAST(SUM(tok) AS BIGINT) AS total_tokens
FROM bb GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# mrr_eval
# ---------------------------------------------------------------------------


def q_mrr_eval(sf_dir: str):
    from pynomaly_ray.pipelines.queries_wave37 import (
        _dim_bounds,
        quantize_codes,
    )
    from pynomaly_ray.stages.similarity import _embedding_matrix

    mn, mx = _dim_bounds(sf_dir)
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def code_rows(batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch)
        if m.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "codes": pa.array([], pa.list_(pa.int64())),
                }
            )
        e6 = np.floor(m * 1_000_000.0 + 0.5).astype(np.int64)
        q = quantize_codes(e6, mn, mx)
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "label": batch["label"].cast(pa.int64()),
                "codes": pa.array(list(q), pa.list_(pa.int64())),
            }
        )

    surf = (
        ds.map_batches(code_rows, batch_format="pyarrow", batch_size=65536)
        .to_pandas()
        .sort_values("vec_id", kind="mergesort")
    )
    ids = surf["vec_id"].to_numpy(np.int64)
    labels = surf["label"].to_numpy(np.int64)
    A = np.stack(surf["codes"].to_numpy()).astype(np.float64)
    n = len(ids)
    k = min(_MRR_K, n - 1)

    def mrr_partial(batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch)
        if m.size == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "n_queries": pa.array([], pa.int64()),
                    "sum_mrr_scaled": pa.array([], pa.int64()),
                }
            )
        e6 = np.floor(m * 1_000_000.0 + 0.5).astype(np.int64)
        c = quantize_codes(e6, mn, mx).astype(np.float64)
        dots = c @ A.T  # exact integer values in float64 (<= 64*255^2)
        bid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        own = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.arange(len(bid))
        # composite key realizes the (dot DESC, cand_id ASC) total order
        # exactly: candidate POSITION stands in for id (ids are sorted,
        # so pos order == id order), keeping dot*n + pos < 2^53 — exact
        # in float64 straight off the GEMM, no int64 matrix to build —
        # up to ~2^30 candidates
        comp = dots * np.float64(n) + (
            np.float64(n - 1) - np.arange(n, dtype=np.float64)
        )[None, :]
        pos_self = np.searchsorted(ids, bid)
        comp[rows, pos_self] = -1.0  # exclude self; real comps are >= 0
        top = np.argpartition(comp, n - k, axis=1)[:, n - k :]
        tv = np.take_along_axis(comp, top, axis=1)
        order = np.argsort(-tv, axis=1, kind="stable")
        top_sorted = np.take_along_axis(top, order, axis=1)
        hit = labels[top_sorted] == own[:, None]
        first = np.argmax(hit, axis=1)  # 0 if no hit — guard below
        has = hit.any(axis=1)
        score = np.where(has, _MRR_SCALE // (first + 1), 0).astype(np.int64)
        part = (
            pd.DataFrame({"label": own, "score": score})
            .groupby("label", sort=False)["score"]
            .agg(n_queries="size", sum_mrr_scaled="sum")
            .reset_index()
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    # small batches so the quadratic scoring fans out across the pool
    # instead of serializing in one oversized task
    parts = ds.map_batches(mrr_partial, batch_format="pyarrow", batch_size=512)
    out = hash_aggregate(
        parts,
        ["label"],
        lambda df: df.groupby("label", sort=False)
        .agg(
            n_queries=("n_queries", "sum"),
            sum_mrr_scaled=("sum_mrr_scaled", "sum"),
        )
        .reset_index(),
    )
    df = collect_sorted(out, ["label"])
    for c in ("label", "n_queries", "sum_mrr_scaled"):
        df[c] = df[c].astype(np.int64)
    return df[["label", "n_queries", "sum_mrr_scaled"]]


SQL_MRR_EVAL = f"""
WITH e AS (
  SELECT vec_id, t.i AS dim,
         CAST(FLOOR(CAST(embedding[t.i] AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS e6
  FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
),
b AS (SELECT dim, MIN(e6) AS mn, MAX(e6) AS mx FROM e GROUP BY dim),
q AS (
  SELECT e.vec_id, e.dim,
         ((e.e6 - b.mn) * 255) // (b.mx - b.mn + 1) AS code
  FROM e JOIN b ON e.dim = b.dim
),
dots AS (
  SELECT a.vec_id AS a_id, c.vec_id AS b_id,
         CAST(SUM(a.code * c.code) AS BIGINT) AS dot
  FROM q a JOIN q c ON a.dim = c.dim AND a.vec_id <> c.vec_id
  GROUP BY a.vec_id, c.vec_id
),
r AS (
  SELECT a_id, b_id,
         ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY dot DESC, b_id)
           AS rn
  FROM dots
),
fm AS (
  SELECT r.a_id, MIN(r.rn) AS rank
  FROM r
  JOIN embeddings ea ON ea.vec_id = r.a_id
  JOIN embeddings eb ON eb.vec_id = r.b_id
  WHERE r.rn <= {_MRR_K} AND ea.label = eb.label
  GROUP BY r.a_id
)
SELECT CAST(ea.label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(COALESCE({_MRR_SCALE} // fm.rank, 0)) AS BIGINT)
         AS sum_mrr_scaled
FROM embeddings ea LEFT JOIN fm ON fm.a_id = ea.vec_id
GROUP BY ea.label
ORDER BY label
"""


ORACLE_QUERIES["padding_waste"] = (q_padding_waste, SQL_PADDING_WASTE)
ORACLE_QUERIES["mrr_eval"] = (q_mrr_eval, SQL_MRR_EVAL)
