"""Wave-52: k-anonymity audit, skip-gram pair mining, and hierarchical
revenue shares — privacy, embedding-training, and ratio-to-parent
operator families, each integer-exact against a DuckDB twin.

``k_anonymity`` — the privacy audit beyond PII scrubbing (the suite's
``pii_scrub`` removes direct identifiers; this measures QUASI-identifier
risk): customers group by (segment, nation, $1000 account-balance
band); a group smaller than k=5 is re-identifiable.  Reported per
segment as n_groups / n_small_groups / n_risky_rows.  One keyed
exchange over map-side group partials.

``skipgram_pairs`` — the word2vec training-pair surface: (center,
context) token pairs within distance <= 2, counted corpus-wide and
top-10 ranked.  The engine builds all four shift offsets per doc with
array slicing (no position self-join, no Python per-token loop),
pre-aggregates map-side, and exchanges only distinct pair partials;
the oracle is the quadratic positions self-join.

``revenue_share_bps`` — ratio-to-parent in integer basis points:
each nation's share of its region's lineitem revenue as
``rev_nation * 10000 // rev_region`` (exact integer division on the
cents grid both sides — no float share ever materializes).  The
hierarchical-share shape every rollup dashboard needs; region totals
broadcast as a 5-row dim after one keyed aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    collect_sorted,
    dim_lookup,
    hash_aggregate,
    topk,
)
from pynomaly_ray.pipelines.queries import (
    ORACLE_QUERIES,
    _ASCII_TOKEN_RE,
    _pq,
)

_K_ANON = 5
_BAND = 1000.0
_SG_K = 10
_SG_WIN = 2


# ---------------------------------------------------------------------------
# k_anonymity
# ---------------------------------------------------------------------------


def q_k_anonymity(sf_dir: str):
    ds = _pq(sf_dir, "customer", ["c_mktsegment", "c_nationkey", "c_acctbal"])

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        band = np.floor(
            df["c_acctbal"].to_numpy(np.float64) / _BAND
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "c_mktsegment": df["c_mktsegment"].to_numpy(object),
                    "c_nationkey": df["c_nationkey"].to_numpy(np.int64),
                    "band": band,
                }
            )
            .groupby(["c_mktsegment", "c_nationkey", "band"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "c_mktsegment": pd.Series(dtype=object),
                    "n_groups": pd.Series(dtype=np.int64),
                    "n_small_groups": pd.Series(dtype=np.int64),
                    "n_risky_rows": pd.Series(dtype=np.int64),
                }
            )
        d = (
            df.groupby(["c_mktsegment", "c_nationkey", "band"], sort=False)[
                "c"
            ]
            .sum()
            .reset_index()
        )
        d["small"] = (d["c"] < _K_ANON).astype(np.int64)
        d["risky"] = d["c"] * d["small"]
        return (
            d.groupby("c_mktsegment", sort=False)
            .agg(
                n_groups=("c", "size"),
                n_small_groups=("small", "sum"),
                n_risky_rows=("risky", "sum"),
            )
            .reset_index()
        )

    out = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["c_mktsegment"],
        audit,
    )
    df = collect_sorted(out, ["c_mktsegment"])
    for c in ("n_groups", "n_small_groups", "n_risky_rows"):
        df[c] = df[c].astype(np.int64)
    return df[["c_mktsegment", "n_groups", "n_small_groups", "n_risky_rows"]]


SQL_K_ANONYMITY = f"""
WITH g AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(FLOOR(c_acctbal / {_BAND}) AS BIGINT) AS band,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM customer GROUP BY c_mktsegment, c_nationkey, band
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN c < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_groups,
       CAST(SUM(CASE WHEN c < {_K_ANON} THEN c ELSE 0 END) AS BIGINT)
         AS n_risky_rows
FROM g GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# skipgram_pairs
# ---------------------------------------------------------------------------


def q_skipgram_pairs(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").astype(str)
        toks = s.str.findall(_ASCII_TOKEN_RE)
        centers: list = []
        contexts: list = []
        for w in toks:
            arr = np.asarray(w, dtype=object)
            for d in range(1, _SG_WIN + 1):
                if len(arr) > d:
                    a, b = arr[:-d], arr[d:]
                    centers.append(a)
                    contexts.append(b)
                    centers.append(b)
                    contexts.append(a)
        if not centers:
            return pa.table(
                {
                    "center": pa.array([], pa.string()),
                    "context": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        g = (
            pd.DataFrame(
                {
                    "center": np.concatenate(centers),
                    "context": np.concatenate(contexts),
                }
            )
            .groupby(["center", "context"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    per_pair = hash_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["center", "context"],
        lambda df: df.groupby(["center", "context"], sort=False)["cnt"]
        .sum()
        .reset_index(),
    )
    out = topk(
        per_pair,
        ["cnt", "center", "context"],
        _SG_K,
        descending=[True, False, False],
    )
    out["cnt"] = out["cnt"].astype(np.int64)
    return out[["center", "context", "cnt"]]


SQL_SKIPGRAM_PAIRS = rf"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '{_ASCII_TOKEN_RE}') AS ws
  FROM documents
),
u AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w
),
p AS (
  SELECT a.ws[a.i] AS center, a.ws[j.j] AS context
  FROM u a
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(
      GREATEST(a.i - {_SG_WIN}, 1),
      LEAST(a.i + {_SG_WIN}, len(a.ws))
    )) AS j
  ) j
  WHERE j.j <> a.i
)
SELECT center, context, CAST(COUNT(*) AS BIGINT) AS cnt
FROM p GROUP BY center, context
ORDER BY cnt DESC, center, context
LIMIT {_SG_K}
"""


# ---------------------------------------------------------------------------
# revenue_share_bps
# ---------------------------------------------------------------------------


def q_revenue_share_bps(sf_dir: str):
    import os

    import pyarrow.parquet as papq

    li = _pq(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
    supp = papq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    nation = papq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = papq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    )

    # dims: supplier -> nation -> region (all broadcast lookups)
    s2n = dim_lookup(supp, "s_suppkey", "s_nationkey")
    n2r = dim_lookup(nation, "n_nationkey", "n_regionkey")
    n2name = dim_lookup(nation, "n_nationkey", "n_name")
    r2name = dim_lookup(region, "r_regionkey", "r_name")

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cents = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
            * 100.0
            + 0.5
        ).astype(np.int64)
        nk = df["l_suppkey"].map(s2n).to_numpy(np.int64)
        g = (
            pd.DataFrame({"n_nationkey": nk, "cents": cents})
            .groupby("n_nationkey", sort=False)["cents"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    per_nation = hash_aggregate(
        li.map_batches(pre, batch_format="pyarrow"),
        ["n_nationkey"],
        lambda df: df.groupby("n_nationkey", sort=False)["cents"]
        .sum()
        .reset_index(),
    ).to_pandas()  # 25 rows: the nation dim scale, never fact rows
    per_nation["r"] = per_nation["n_nationkey"].map(n2r).astype(np.int64)
    per_region = per_nation.groupby("r")["cents"].sum()
    out = pd.DataFrame(
        {
            "n_name": per_nation["n_nationkey"].map(n2name),
            "r_name": per_nation["r"].map(r2name),
            "share_bps": (
                per_nation["cents"].to_numpy(np.int64) * 10000
            )
            // per_nation["r"].map(per_region).to_numpy(np.int64),
        }
    ).sort_values("n_name", kind="mergesort").reset_index(drop=True)
    out["share_bps"] = out["share_bps"].astype(np.int64)
    return out[["n_name", "r_name", "share_bps"]]


SQL_REVENUE_SHARE_BPS = """
WITH rev AS (
  SELECT n.n_name, r.r_name, r.r_regionkey,
         CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100
              + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY n.n_name, r.r_name, r.r_regionkey
),
reg AS (
  SELECT r_regionkey, CAST(SUM(cents) AS BIGINT) AS total
  FROM rev GROUP BY r_regionkey
)
SELECT rev.n_name, rev.r_name,
       CAST((rev.cents * 10000) // reg.total AS BIGINT) AS share_bps
FROM rev JOIN reg USING (r_regionkey)
ORDER BY rev.n_name
"""


ORACLE_QUERIES["k_anonymity"] = (q_k_anonymity, SQL_K_ANONYMITY)
ORACLE_QUERIES["skipgram_pairs"] = (q_skipgram_pairs, SQL_SKIPGRAM_PAIRS)
ORACLE_QUERIES["revenue_share_bps"] = (
    q_revenue_share_bps,
    SQL_REVENUE_SHARE_BPS,
)
