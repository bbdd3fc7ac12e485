"""Wave-46: streaming debounce, banded self-join, 1-NN label agreement,
and greedy max-coverage corpus selection.

Four operator families the suite did not yet cover, each exact against
a DuckDB twin:

``event_debounce`` — stateful stream hygiene: per (user, event_type)
stream ordered by timestamp, an event is *suppressed* when it arrives
within 15 minutes of the previous raw event of the same key (LAG
semantics — the dedup window a click/telemetry ingest applies before
events reach a training corpus).  Engine shape: one keyed exchange on
``user_id`` (event_type co-located for free), a single vectorized
shift-compare per bucket, then a tiny per-type partial-sum exchange.
Reference anchor: PyNomaly's stream mode scores points against a
trailing window of prior state (reference/PyNomaly/loop.py:993-1046);
debounce is the same trailing-window shape with a boolean verdict.

``order_bursts`` — banded NON-EQUI self-join: pairs of orders by the
same customer placed within 30 days of each other (the interval/range
join family — every prior join in the suite is equi or as-of).  The
engine never builds the pair set: per customer-bucket, one offset-keyed
``searchsorted`` counts each row's in-band neighbors (the same kernel
shape as the trailing RANGE window), and pair count = sum/2 — exact,
O(n log n) per bucket vs the oracle's quadratic join.

``knn_accuracy`` — 1-NN label agreement (the standard embedding-space
eval: does each vector's nearest neighbor share its label?) over the
wave-37 int8 code surface, so ranking is an EXACT integer dot product
and the verdict is hash-certifiable.  Scale note: this is the exact
brute-force evaluator (codes broadcast once via a task closure, one
float64 GEMM per batch — exact below 2^53); a 100-TB corpus runs it on
an eval sample or swaps in the IVF path (``knn_cosine_ivf``).

``coverage_select`` — greedy max-coverage corpus selection (facility
location / set cover, the classic data-curation primitive: pick k docs
that together cover the most distinct token bigrams).  k exchange
rounds; each round scores marginal gain per doc against a broadcast
covered-set (grows only with the selected docs, never the corpus) and
takes a global (gain DESC, doc_id ASC) argmax.  The DuckDB twin is the
k-step unrolled chained-CTE greedy — certifying an ITERATIVE selection
loop end-to-end, not just one aggregate.  Candidates are docs with at
least one bigram (identical on both sides); the engine compares
bigrams by 64-bit hash (collision odds ~2^-44 at this universe size),
the oracle by string — any collision would surface as a hash mismatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    collect_sorted,
    hash_aggregate,
)
from pynomaly_ray.functions.hashing import hash_strings, nul_safe_key
from pynomaly_ray.pipelines.queries import (
    ORACLE_QUERIES,
    _ASCII_TOKEN_RE,
    _from_pandas,
    _pq,
)

_GAP_US = 900_000_000  # 15-minute debounce window
_BURST_DAYS = 30  # order-burst band width (days)
_DAY_US = 86_400_000_000
_DAY_BLOCK = 10_000_000  # offset-key block: >> max day ordinal (~11.6k)
_K_SELECT = 8  # coverage_select greedy steps


# ---------------------------------------------------------------------------
# event_debounce
# ---------------------------------------------------------------------------


def q_event_debounce(sf_dir: str):
    ds = _pq(sf_dir, "events", ["user_id", "event_type", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["ts_us"] = df.pop("ts").astype("int64")
        return _from_pandas(df)

    def debounce(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype=object),
                    "kept": pd.Series(dtype=np.int64),
                    "suppressed": pd.Series(dtype=np.int64),
                }
            )
        d = df.sort_values(
            ["user_id", "event_type", "ts_us"], kind="mergesort"
        )
        same = (
            d["user_id"].shift() == d["user_id"]
        ) & (d["event_type"].shift() == d["event_type"])
        gap = d["ts_us"] - d["ts_us"].shift()
        sup = (same & (gap <= _GAP_US)).to_numpy()
        out = (
            pd.DataFrame(
                {
                    "event_type": nul_safe_key(d["event_type"]),
                    "sup": sup,
                }
            )
            .groupby("event_type", sort=False)["sup"]
            .agg(kept=lambda s: int((~s).sum()), suppressed="sum")
            .reset_index()
        )
        out["event_type"] = out["event_type"].astype(object)
        return out

    parts = hash_aggregate(ds.map_batches(pre, batch_format="pyarrow"), ["user_id"], debounce)
    out = hash_aggregate(
        parts,
        ["event_type"],
        lambda df: df.groupby(nul_safe_key(df["event_type"]), sort=False)
        .agg(kept=("kept", "sum"), suppressed=("suppressed", "sum"))
        .reset_index(),
    )
    df = collect_sorted(out, ["event_type"])
    df["kept"] = df["kept"].astype(np.int64)
    df["suppressed"] = df["suppressed"].astype(np.int64)
    return df[["event_type", "kept", "suppressed"]]


SQL_EVENT_DEBOUNCE = f"""
WITH w AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY epoch_us(ts)
         ) AS gap
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN gap IS NULL OR gap > {_GAP_US}
                THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       CAST(SUM(CASE WHEN gap <= {_GAP_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS suppressed
FROM w GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# order_bursts
# ---------------------------------------------------------------------------


def q_order_bursts(sf_dir: str):
    ds = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def pre(t: pa.Table) -> pa.Table:
        day = (
            t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ).astype(np.int64) // _DAY_US
        return pa.table(
            {
                "o_custkey": t["o_custkey"].cast(pa.int64()),
                "day": pa.array(day, pa.int64()),
            }
        )

    def bursts(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "o_custkey": pd.Series(dtype=np.int64),
                    "burst_pairs": pd.Series(dtype=np.int64),
                }
            )
        d = df.sort_values(["o_custkey", "day"], kind="mergesort")
        cust = d["o_custkey"].to_numpy(np.int64)
        day = d["day"].to_numpy(np.int64)
        # offset-keyed single searchsorted: each customer's rows live in
        # a private key block, so one global searchsorted answers every
        # per-customer band query (same kernel shape as trailing_events)
        g = np.cumsum(np.r_[0, cust[1:] != cust[:-1]])
        key = g * _DAY_BLOCK + day
        lo = np.searchsorted(key, key - _BURST_DAYS, side="left")
        hi = np.searchsorted(key, key + _BURST_DAYS, side="right")
        in_band = hi - lo - 1  # excluding the row itself
        per = (
            pd.DataFrame({"o_custkey": cust, "n": in_band})
            .groupby("o_custkey", sort=False)["n"]
            .sum()
        )
        out = (per // 2).astype(np.int64).reset_index(name="burst_pairs")
        return out[out["burst_pairs"] > 0]

    out = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"), ["o_custkey"], bursts
    )
    df = collect_sorted(out, ["o_custkey"])
    if df.empty or "o_custkey" not in df.columns:
        return pd.DataFrame(
            {
                "o_custkey": pd.Series(dtype=np.int64),
                "burst_pairs": pd.Series(dtype=np.int64),
            }
        )
    df["o_custkey"] = df["o_custkey"].astype(np.int64)
    df["burst_pairs"] = df["burst_pairs"].astype(np.int64)
    return df[["o_custkey", "burst_pairs"]]


SQL_ORDER_BURSTS = f"""
WITH o AS (
  SELECT o_custkey,
         CAST(epoch_us(o_orderdate) // {_DAY_US} AS BIGINT) AS day,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rid
  FROM orders
)
SELECT a.o_custkey, CAST(COUNT(*) AS BIGINT) AS burst_pairs
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.rid < b.rid
 AND ABS(a.day - b.day) <= {_BURST_DAYS}
GROUP BY a.o_custkey
ORDER BY a.o_custkey
"""


# ---------------------------------------------------------------------------
# knn_accuracy
# ---------------------------------------------------------------------------


def q_knn_accuracy(sf_dir: str):
    from pynomaly_ray.pipelines.queries_wave37 import (
        _dim_bounds,
        quantize_codes,
    )
    from pynomaly_ray.stages.similarity import _embedding_matrix

    mn, mx = _dim_bounds(sf_dir)
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    # pass 1: the broadcast surface — every vector's int8 codes + label,
    # sorted by vec_id so argmax's first-max == smallest cand id
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
    # float64 GEMM is exact here: codes <= 255, 64-dim dots <= 4.2e6 << 2^53
    A = np.stack(surf["codes"].to_numpy()).astype(np.float64)

    # pass 2: per-batch exact integer 1-NN + per-label agreement partials
    def nn_partial(batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch)
        if m.size == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                    "n_agree": pa.array([], pa.int64()),
                }
            )
        e6 = np.floor(m * 1_000_000.0 + 0.5).astype(np.int64)
        c = quantize_codes(e6, mn, mx).astype(np.float64)
        dots = c @ A.T  # (B, N) exact in float64
        bid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ids, bid)
        rows = np.arange(len(bid))
        dots[rows, pos] = -1.0  # exclude self (codes are >= 0)
        nn = np.argmax(dots, axis=1)  # first max -> smallest cand vec_id
        own = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        agree = (labels[nn] == own).astype(np.int64)
        part = (
            pd.DataFrame({"label": own, "agree": agree})
            .groupby("label", sort=False)["agree"]
            .agg(n_vecs="size", n_agree="sum")
            .reset_index()
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    # small batches so the quadratic scoring fans out across the pool
    # instead of serializing in one oversized task
    parts = ds.map_batches(nn_partial, batch_format="pyarrow", batch_size=512)
    out = hash_aggregate(
        parts,
        ["label"],
        lambda df: df.groupby("label", sort=False)
        .agg(n_vecs=("n_vecs", "sum"), n_agree=("n_agree", "sum"))
        .reset_index(),
    )
    df = collect_sorted(out, ["label"])
    for c in ("label", "n_vecs", "n_agree"):
        df[c] = df[c].astype(np.int64)
    return df[["label", "n_vecs", "n_agree"]]


SQL_KNN_ACCURACY = """
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
nn AS (
  SELECT a_id, b_id,
         ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY dot DESC, b_id)
           AS rn
  FROM dots
)
SELECT CAST(ea.label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN ea.label = eb.label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_agree
FROM nn
JOIN embeddings ea ON ea.vec_id = nn.a_id
JOIN embeddings eb ON eb.vec_id = nn.b_id
WHERE nn.rn = 1
GROUP BY ea.label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# coverage_select
# ---------------------------------------------------------------------------


def _bigram_pairs(sf_dir: str):
    """(doc_id, bg_hash) distinct pairs — the coverage surface, built
    once, bucketed BY DOC, and materialized (tens of rows per doc,
    ~800x smaller than the text it summarizes).  The one-time doc
    bucketing makes every doc's pairs block-complete, so each greedy
    round below is a MAP-ONLY pass (per-block exact gains + local
    top-1) instead of a fresh exchange per round."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().astype(str)
        toks = s.str.findall(_ASCII_TOKEN_RE)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.fromiter((max(len(w) - 1, 0) for w in toks), np.int64)
        if counts.sum() == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "bg": pa.array([], pa.int64()),
                }
            )
        grams = [
            w[i] + " " + w[i + 1]
            for w in toks
            for i in range(len(w) - 1)
        ]
        h = hash_strings(grams).astype(np.int64)
        d = pd.DataFrame(
            {"doc_id": np.repeat(did, counts), "bg": h}
        ).drop_duplicates()  # a doc sits in one row -> global per-doc dedup
        return pa.Table.from_pandas(d, preserve_index=False)

    return hash_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["doc_id"],
        lambda df: df,  # identity: co-locate each doc's pairs in one block
    ).materialize()


def q_coverage_select(sf_dir: str):
    pairs = _bigram_pairs(sf_dir)

    covered = np.empty(0, dtype=np.int64)
    selected: list[int] = []
    out_rows = []
    for step in range(1, _K_SELECT + 1):
        cov = covered
        sel = np.asarray(sorted(selected), dtype=np.int64)

        def local_best(t: pa.Table, cov=cov, sel=sel) -> pa.Table:
            empty = pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "gain": pa.array([], pa.int64()),
                    "bgs": pa.array([], pa.list_(pa.int64())),
                }
            )
            df = t.to_pandas()
            df = df[~df["doc_id"].isin(sel)]
            if df.empty:
                return empty
            fresh = ~np.isin(df["bg"].to_numpy(np.int64), cov)
            g = (
                pd.DataFrame(
                    {"doc_id": df["doc_id"].to_numpy(np.int64), "f": fresh}
                )
                .groupby("doc_id", sort=False)["f"]
                .sum()
                .astype(np.int64)
                .reset_index(name="gain")
            )
            # each doc is block-complete (bucketed surface, whole-block
            # batches), so the block's best IS that doc's global gain;
            # shipping the candidate's own hashes (tens of ints) spares
            # a second fetch pass when it wins globally
            g = g.sort_values(
                ["gain", "doc_id"], ascending=[False, True], kind="mergesort"
            ).head(1)
            best = int(g["doc_id"].iloc[0])
            bgs = df.loc[
                df["doc_id"].to_numpy(np.int64) == best, "bg"
            ].to_numpy(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array([best], pa.int64()),
                    "gain": pa.array(
                        [int(g["gain"].iloc[0])], pa.int64()
                    ),
                    "bgs": pa.array([bgs.tolist()], pa.list_(pa.int64())),
                }
            )

        # map-only round: per-block exact top-1 partials, tiny driver merge
        cand = pairs.map_batches(
            local_best, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        if cand.empty or "doc_id" not in cand.columns:
            break
        cand = cand[cand["gain"].notna()]
        if cand.empty:
            break
        cand = cand.sort_values(
            ["gain", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        win_doc = int(cand["doc_id"].iloc[0])
        win_gain = int(cand["gain"].iloc[0])
        out_rows.append((step, win_doc, win_gain))
        selected.append(win_doc)
        covered = np.union1d(
            covered, np.asarray(cand["bgs"].iloc[0], dtype=np.int64)
        )

    return pd.DataFrame(
        out_rows, columns=["step", "doc_id", "gain"]
    ).astype(np.int64)


def _coverage_sql(k: int) -> str:
    """The k-step unrolled chained-CTE greedy (DuckDB has no aggregate
    recursion, so the loop is laid out step by step).  Every step CTE
    is MATERIALIZED and references only the PREVIOUS step's selected-set
    and covered-set CTEs — without materialization the chain re-inlines
    each earlier step exponentially."""
    head = rf"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '{_ASCII_TOKEN_RE}') AS ws
  FROM documents
),
u AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w
),
bg AS MATERIALIZED (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] AS b FROM u
),
sel0 AS (SELECT NULL::BIGINT AS doc_id WHERE FALSE),
cov0 AS (SELECT NULL::VARCHAR AS b WHERE FALSE)"""
    parts = [head]
    for i in range(1, k + 1):
        parts.append(
            f""",
pick{i} AS MATERIALIZED (
  SELECT bg.doc_id,
         CAST(COUNT(DISTINCT CASE WHEN bg.b NOT IN (SELECT b FROM cov{i - 1})
              THEN bg.b END) AS BIGINT) AS gain
  FROM bg
  WHERE bg.doc_id NOT IN (SELECT doc_id FROM sel{i - 1})
  GROUP BY bg.doc_id
  ORDER BY gain DESC, bg.doc_id
  LIMIT 1
),
sel{i} AS MATERIALIZED (
  SELECT doc_id FROM sel{i - 1} UNION ALL SELECT doc_id FROM pick{i}
),
cov{i} AS MATERIALIZED (
  SELECT b FROM cov{i - 1}
  UNION
  SELECT b FROM bg WHERE doc_id IN (SELECT doc_id FROM pick{i})
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, CAST(doc_id AS BIGINT) AS doc_id, gain FROM pick{i}"
        for i in range(1, k + 1)
    )
    parts.append(f"\n{union}\nORDER BY step")
    return "".join(parts)


SQL_COVERAGE_SELECT = _coverage_sql(_K_SELECT)


ORACLE_QUERIES["event_debounce"] = (q_event_debounce, SQL_EVENT_DEBOUNCE)
ORACLE_QUERIES["order_bursts"] = (q_order_bursts, SQL_ORDER_BURSTS)
ORACLE_QUERIES["knn_accuracy"] = (q_knn_accuracy, SQL_KNN_ACCURACY)
ORACLE_QUERIES["coverage_select"] = (q_coverage_select, SQL_COVERAGE_SELECT)
