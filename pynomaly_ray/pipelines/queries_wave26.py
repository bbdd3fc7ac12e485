"""Wave-26 pipelines: streaming-window and traversal shapes that were
still missing from the registry.

- ``cumulative_unique_users`` — cumulative COUNT(DISTINCT user) per
  hour.  The engine never carries a distinct-set across days: each
  user collapses to a first-seen hour (one keyed aggregate on
  user_id), the per-hour new-user counts are tiny (#hours rows), and
  the running total folds driver-side — the standard trick that
  turns a cumulative-distinct window (quadratic if done naively)
  into one linear exchange.
- ``hopping_window_counts`` — hopping (overlapping) event-time
  windows: size 3 h, hop 1 h, per event_type.  Unlike the existing
  trailing RANGE window (``trailing_events``), every event is
  *multi-assigned* to the 3 windows that cover it with a vectorized
  repeat inside the scan, then it is one plain keyed count — the
  flat-map-then-aggregate shape streaming engines use for hopping
  windows, and the exchange volume is (size/hop)× the input, never
  a per-window rescan.
- ``sssp_distances`` — bounded multi-source weighted shortest path
  (Bellman-Ford, 4 rounds) over the derived DIRECTED order graph
  (same construction as ``hits_scores``) with deterministic integer
  weights ``1 + (u+v) % 7``.  Each round is exactly one hash join
  (current distances onto edges at the source endpoint, min-collapsed
  per bucket) + one min-aggregate — the matrix-vector product of the
  (min,+) semiring, so the round count (not corpus size) bounds the
  exchange count.  Oracle: depth-bounded DuckDB RECURSIVE CTE with
  UNION set-semantics reduced by MIN(dist); distances are small
  integers (≤ 4·7), so the recursion's working set stays bounded.
- ``page_orders`` — keyset-free pagination: ROW_NUMBER over a global
  order, rows 101–150.  The engine takes top-(offset+limit) via the
  local-top-k + driver-merge path (no global sort, no full
  materialization) and slices the page out; only offset+limit rows
  ever reach the driver.
- ``gopher_quality_counts`` — a Gopher-style composite document
  quality rule (Rae et al. 2021, arXiv:2112.11446 §A1.1): word count
  in [20, 80], mean word length in [25/6, 27/6] (integer
  cross-multiplied — no float ratio crosses the oracle), and at
  least one of five stopwords present; counted per source.  All
  three signals are vectorized string kernels over the same explicit
  ASCII token class the other text oracles use, so the parity claim
  is tokenizer-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    PartitionedTable,
    collect_sorted,
    hash_aggregate,
    topk,
)
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _from_pandas, _pq


# ---------------------------------------------------------------------------
# cumulative_unique_users
# ---------------------------------------------------------------------------
_FS_US_PER_HOUR = 3_600_000_000


def q_cumulative_unique_users(sf_dir: str):
    ev = _pq(sf_dir, "events", ["user_id", "ts"])

    def first_seen(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "hour_bucket": t["ts"].to_pandas().astype("int64")
                // _FS_US_PER_HOUR,
            }
        )
        g = df.groupby("user_id", sort=False)["hour_bucket"].min().reset_index()
        return _from_pandas(g)

    per_user = hash_aggregate(
        ev.map_batches(first_seen, batch_format="pyarrow"),
        ["user_id"],
        lambda df: df.groupby("user_id", sort=False)["hour_bucket"]
        .min()
        .reset_index(),
    )

    def day_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            df.groupby("hour_bucket", sort=False)
            .size()
            .reset_index(name="new_users")
        )
        return _from_pandas(g)

    per_day = hash_aggregate(
        per_user.map_batches(day_partial, batch_format="pyarrow"),
        ["hour_bucket"],
        lambda df: df.groupby("hour_bucket", sort=False)["new_users"]
        .sum()
        .reset_index(),
    )
    df = collect_sorted(per_day, ["hour_bucket"])
    if df.empty or "hour_bucket" not in df.columns:
        return pd.DataFrame(
            {
                "hour_bucket": pd.Series(dtype=np.int64),
                "new_users": pd.Series(dtype=np.int64),
                "cum_users": pd.Series(dtype=np.int64),
            }
        )
    df["hour_bucket"] = df["hour_bucket"].astype(np.int64)
    df["new_users"] = df["new_users"].astype(np.int64)
    df["cum_users"] = df["new_users"].cumsum().astype(np.int64)
    return df[["hour_bucket", "new_users", "cum_users"]]


SQL_CUMULATIVE_UNIQUE_USERS = """
WITH fd AS (
  SELECT user_id,
         MIN(CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT)) AS hour_bucket
  FROM events GROUP BY user_id
),
d AS (
  SELECT hour_bucket, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM fd GROUP BY hour_bucket
)
SELECT hour_bucket, new_users,
       CAST(SUM(new_users) OVER (ORDER BY hour_bucket) AS BIGINT) AS cum_users
FROM d
ORDER BY hour_bucket
"""

ORACLE_QUERIES["cumulative_unique_users"] = (
    q_cumulative_unique_users,
    SQL_CUMULATIVE_UNIQUE_USERS,
)


# ---------------------------------------------------------------------------
# hopping_window_counts
# ---------------------------------------------------------------------------
_US_PER_HOUR = 3_600_000_000
_HOP_WINDOWS = 3  # window size = 3 hops of 1 hour


def q_hopping_window_counts(sf_dir: str):
    ev = _pq(sf_dir, "events", ["event_type", "ts"])

    def assign(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pandas()
        hr = (t["ts"].to_pandas().astype("int64") // _US_PER_HOUR).to_numpy()
        # multi-assign: event at hour h lands in windows h, h-1, h-2
        n = len(hr)
        ws = np.repeat(hr, _HOP_WINDOWS) - np.tile(
            np.arange(_HOP_WINDOWS, dtype=np.int64), n
        )
        df = pd.DataFrame(
            {
                "event_type": np.repeat(et.to_numpy(), _HOP_WINDOWS),
                "window_start": ws,
            }
        )
        g = (
            df.groupby(["event_type", "window_start"], sort=False)
            .size()
            .reset_index(name="n_events")
        )
        return _from_pandas(g)

    out = hash_aggregate(
        ev.map_batches(assign, batch_format="pyarrow", batch_size=65536),
        ["event_type", "window_start"],
        lambda df: df.groupby(["event_type", "window_start"], sort=False)[
            "n_events"
        ]
        .sum()
        .reset_index(),
    )
    df = collect_sorted(out, ["event_type", "window_start"])
    if df.empty or "event_type" not in df.columns:
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype=object),
                "window_start": pd.Series(dtype=np.int64),
                "n_events": pd.Series(dtype=np.int64),
            }
        )
    df["window_start"] = df["window_start"].astype(np.int64)
    df["n_events"] = df["n_events"].astype(np.int64)
    return df[["event_type", "window_start", "n_events"]]


SQL_HOPPING_WINDOW_COUNTS = f"""
SELECT event_type,
       CAST(hr - k AS BIGINT) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM (
  SELECT event_type,
         CAST(FLOOR(epoch_us(ts) / {_US_PER_HOUR}) AS BIGINT) AS hr
  FROM events
) e
CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS k) s
GROUP BY event_type, hr - k
ORDER BY event_type, window_start
"""

ORACLE_QUERIES["hopping_window_counts"] = (
    q_hopping_window_counts,
    SQL_HOPPING_WINDOW_COUNTS,
)


# ---------------------------------------------------------------------------
# sssp_distances
# ---------------------------------------------------------------------------
_SSSP_ROUNDS = 4
_SSSP_SEED_MOD = 50


def q_sssp_distances(sf_dir: str):
    from pynomaly_ray.pipelines.queries_wave24 import _directed_edges

    edges = _directed_edges(sf_dir)  # u -> v, distinct

    def weighted(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(u),
                "v": pa.array(v),
                "w": pa.array(1 + (u + v) % 7),
            }
        )

    # weighted edges are static across relaxation rounds: partition once
    ew = edges.map_batches(weighted, batch_format="pyarrow").materialize()
    ew_pt = PartitionedTable(ew, ["u"])

    def seeds_of(t: pa.Table) -> pa.Table:
        uu = t["u"].to_numpy(zero_copy_only=False)
        vv = t["v"].to_numpy(zero_copy_only=False)
        nodes = np.unique(np.concatenate([uu, vv]))
        nodes = nodes[nodes % _SSSP_SEED_MOD == 0]
        return pa.table(
            {
                "node": pa.array(nodes.astype(np.int64)),
                "dist": pa.array(np.zeros(len(nodes), dtype=np.int64)),
            }
        )

    best = hash_aggregate(
        ew.map_batches(seeds_of, batch_format="pyarrow"),
        ["node"],
        lambda df: df.drop_duplicates(["node"]),
    ).materialize()

    def as_u(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["node"], "d": t["dist"]})

    def relax(df: pd.DataFrame) -> pd.DataFrame:
        # join output (u, v, w, d) min-collapses per target INSIDE the
        # bucket task — the (min,+) matvec partial
        nd = (df["d"] + df["w"]).astype(np.int64)
        out = (
            pd.DataFrame({"node": df["v"].astype(np.int64), "dist": nd})
            .groupby("node", sort=False)["dist"]
            .min()
            .reset_index()
        )
        out["dist"] = out["dist"].astype(np.int64)
        return out

    for _ in range(_SSSP_ROUNDS):
        cand = ew_pt.join(
            best.map_batches(as_u, batch_format="pyarrow"),
            merge_fn=relax,
        )
        best = hash_aggregate(
            best.union(cand),
            ["node"],
            lambda df: df.groupby("node", sort=False)["dist"]
            .min()
            .reset_index(),
        ).materialize()

    df = collect_sorted(best, ["node"])
    if df.empty or "node" not in df.columns:
        return pd.DataFrame(
            {
                "node": pd.Series(dtype=np.int64),
                "dist": pd.Series(dtype=np.int64),
            }
        )
    df["node"] = df["node"].astype(np.int64)
    df["dist"] = df["dist"].astype(np.int64)
    return df[["node", "dist"]]


SQL_SSSP_DISTANCES = f"""
WITH RECURSIVE m AS (
  SELECT GREATEST(CAST(COUNT(*) / 15 AS BIGINT), 10) AS m FROM orders
),
h AS (
  SELECT CAST(((o_orderkey + 1) % 4294967296) * 2654435761::HUGEINT
              % 4294967296 AS BIGINT) AS hu,
         CAST(((o_custkey + 2) % 4294967296) * 2654435761::HUGEINT
              % 4294967296 AS BIGINT) AS hv
  FROM orders
),
e AS (
  SELECT DISTINCT hu % m.m AS u, hv % m.m AS v
  FROM h CROSS JOIN m
  WHERE hu % m.m <> hv % m.m
),
ew AS (SELECT u, v, 1 + (u + v) % 7 AS w FROM e),
nodes AS (SELECT u AS node FROM ew UNION SELECT v FROM ew),
reach AS (
  SELECT node, 0 AS d, 0 AS hops FROM nodes
  WHERE node % {_SSSP_SEED_MOD} = 0
  UNION
  SELECT ew.v, reach.d + ew.w, reach.hops + 1
  FROM reach JOIN ew ON ew.u = reach.node
  WHERE reach.hops < {_SSSP_ROUNDS}
)
SELECT node, CAST(MIN(d) AS BIGINT) AS dist
FROM reach
GROUP BY node
ORDER BY node
"""

ORACLE_QUERIES["sssp_distances"] = (q_sssp_distances, SQL_SSSP_DISTANCES)


# ---------------------------------------------------------------------------
# page_orders
# ---------------------------------------------------------------------------
_PAGE_OFFSET = 100
_PAGE_LIMIT = 50


def q_page_orders(sf_dir: str):
    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    head = topk(
        ds,
        ["o_totalprice", "o_orderkey"],
        _PAGE_OFFSET + _PAGE_LIMIT,
        descending=[True, False],
    )
    page = head.iloc[_PAGE_OFFSET : _PAGE_OFFSET + _PAGE_LIMIT].reset_index(
        drop=True
    )
    page = page.copy()
    page["rn"] = np.arange(
        _PAGE_OFFSET + 1, _PAGE_OFFSET + 1 + len(page), dtype=np.int64
    )
    page["o_orderkey"] = page["o_orderkey"].astype(np.int64)
    return page[["rn", "o_orderkey", "o_totalprice"]]


SQL_PAGE_ORDERS = f"""
SELECT rn, o_orderkey, o_totalprice
FROM (
  SELECT o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
              AS BIGINT) AS rn
  FROM orders
)
WHERE rn BETWEEN {_PAGE_OFFSET + 1} AND {_PAGE_OFFSET + _PAGE_LIMIT}
ORDER BY rn
"""

ORACLE_QUERIES["page_orders"] = (q_page_orders, SQL_PAGE_ORDERS)


# ---------------------------------------------------------------------------
# gopher_quality_counts
# ---------------------------------------------------------------------------
_GQ_MIN_WORDS = 20
_GQ_MAX_WORDS = 80
# mean word length in [25/6, 27/6], kept as integer cross products
_GQ_LEN_NUM_LO, _GQ_LEN_NUM_HI, _GQ_LEN_DEN = 25, 27, 6
_GQ_STOPWORDS = ("the", "and", "of", "to", "in")
_WS_CLASS = r"[ \t\n\r\f\v]"
_TOKEN_RE = r"[^ \t\n\r\f\v]+"


def q_gopher_quality_counts(sf_dir: str):
    ds = _pq(sf_dir, "documents", ["source", "text"])
    # full-token stopword hit: start-or-ws before, ws-or-end after
    # (python re supports the lookahead; the SQL twin uses token-list
    # membership — both are exactly "some token is a stopword")
    stop_re = (
        r"(?:^|" + _WS_CLASS + r")(?:" + "|".join(_GQ_STOPWORDS) + r")"
        r"(?=" + _WS_CLASS + r"|$)"
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        texts = df["text"].fillna("")
        n_words = texts.str.count(_TOKEN_RE).astype(np.int64)
        wchars = (
            texts.str.len() - texts.str.count(_WS_CLASS)
        ).astype(np.int64)
        has_stop = texts.str.contains(stop_re, regex=True)
        ok = (
            (n_words >= _GQ_MIN_WORDS)
            & (n_words <= _GQ_MAX_WORDS)
            & (_GQ_LEN_NUM_LO * n_words <= _GQ_LEN_DEN * wchars)
            & (_GQ_LEN_DEN * wchars <= _GQ_LEN_NUM_HI * n_words)
            & has_stop
        )
        g = (
            pd.DataFrame({"source": df["source"], "p": ok.astype(np.int64)})
            .groupby("source", sort=False)
            .agg(n_docs=("p", "size"), n_pass=("p", "sum"))
            .reset_index()
        )
        return _from_pandas(g)

    out = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"],
        lambda df: df.groupby("source", sort=False).sum().reset_index(),
    )
    df = collect_sorted(out, ["source"])
    if df.empty or "source" not in df.columns:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_docs": pd.Series(dtype=np.int64),
                "n_pass": pd.Series(dtype=np.int64),
            }
        )
    df["n_docs"] = df["n_docs"].astype(np.int64)
    df["n_pass"] = df["n_pass"].astype(np.int64)
    return df[["source", "n_docs", "n_pass"]]


SQL_GOPHER_QUALITY_COUNTS = rf"""
WITH q AS (
  SELECT source,
         length(regexp_extract_all(text, '{_TOKEN_RE}')) AS n_words,
         length(regexp_replace(text, '{_WS_CLASS}', '', 'g')) AS wchars,
         len(list_filter(regexp_extract_all(text, '{_TOKEN_RE}'),
                         x -> x IN ('the', 'and', 'of', 'to', 'in'))) > 0
           AS has_stop
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_words BETWEEN {_GQ_MIN_WORDS} AND {_GQ_MAX_WORDS}
                      AND {_GQ_LEN_NUM_LO} * n_words <= {_GQ_LEN_DEN} * wchars
                      AND {_GQ_LEN_DEN} * wchars <= {_GQ_LEN_NUM_HI} * n_words
                      AND has_stop
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM q
GROUP BY source
ORDER BY source
"""

ORACLE_QUERIES["gopher_quality_counts"] = (
    q_gopher_quality_counts,
    SQL_GOPHER_QUALITY_COUNTS,
)
