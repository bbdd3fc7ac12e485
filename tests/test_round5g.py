"""Edge-case tests for the round-5 seventh-session operators
(dedup_keep_best, top_unshipped_orders).  Oracle parity at sf0.001 is
covered by the parametrized test_query_matches_oracle sweep; these pin
the hand-checkable corner semantics."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as papq
import pytest


def _write(tmp_path, table: str, df: pd.DataFrame, schema=None) -> str:
    t = pa.Table.from_pandas(df, preserve_index=False)
    if schema is not None:
        t = t.cast(schema)
    papq.write_table(t, os.path.join(tmp_path, f"{table}.parquet"))
    return str(tmp_path)


def _docs(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len().astype(np.int32)
    return _write(tmp_path, "documents", df)


def test_keep_best_picks_longest_then_min_doc_id(ray_session, tmp_path):
    """Case/whitespace variants collapse to one group; the longest raw
    copy wins; equal lengths tie-break to the smaller doc_id."""
    from pynomaly_ray.pipelines.queries import q_dedup_keep_best

    sf = _docs(
        tmp_path,
        [
            (1, "Hello World", "a"),
            (2, "hello   world", "b"),  # longest after raw-length compare (13)
            (3, " HELLO WORLD ", "c"),  # also 13 chars -> tie, doc_id 2 wins
            (4, "unrelated", "d"),
        ],
    )
    out = q_dedup_keep_best(sf)
    assert out["doc_id"].tolist() == [2, 4]
    grp = out.set_index("doc_id")
    assert grp.loc[2, "copies"] == 3
    assert grp.loc[2, "source"] == "b"
    assert grp.loc[4, "copies"] == 1


def test_keep_best_nul_bytes_not_conflated(ray_session, tmp_path):
    """Strings differing only after an embedded NUL are distinct groups
    (the normalized-key hash is NUL-safe, VERDICT r4 bug class)."""
    from pynomaly_ray.pipelines.queries import q_dedup_keep_best

    sf = _docs(
        tmp_path,
        [
            (1, "a\x00b", "s"),
            (2, "a\x00c", "s"),
            (3, "a", "s"),
        ],
    )
    out = q_dedup_keep_best(sf)
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["copies"].tolist() == [1, 1, 1]


def _q3_tables(tmp_path):
    us = pa.timestamp("us")
    _write(
        tmp_path,
        "customer",
        pd.DataFrame(
            {
                "c_custkey": np.array([1, 2, 3], np.int64),
                "c_mktsegment": ["BUILDING", "AUTOMOBILE", "BUILDING"],
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.array([10, 11, 12, 13, 14], np.int64),
                "o_custkey": np.array([1, 1, 2, 3, 3], np.int64),
                "o_orderstatus": ["O", "F", "O", "O", "O"],
                "o_orderdate": pd.to_datetime(
                    [
                        "1997-06-01",  # 10: qualifies
                        "1997-06-01",  # 11: status F -> out
                        "1997-06-01",  # 12: segment AUTOMOBILE -> out
                        "1997-06-01",  # 13: qualifies
                        "1998-06-01",  # 14: orderdate >= cutoff -> out
                    ]
                ),
            }
        ),
        schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_orderdate", us),
            ]
        ),
    )
    _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": np.array([10, 10, 13, 13, 14], np.int64),
                "l_extendedprice": [100.0, 50.0, 200.0, 10.0, 999.0],
                "l_discount": [0.1, 0.0, 0.5, 0.0, 0.0],
                "l_shipdate": pd.to_datetime(
                    [
                        "1998-02-01",  # 10: ships after cutoff
                        "1997-12-01",  # 10: ships BEFORE cutoff -> excluded
                        "1998-02-01",  # 13
                        "1998-03-01",  # 13
                        "1998-02-01",  # 14: order filtered out anyway
                    ]
                ),
            }
        ),
        schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_shipdate", us),
            ]
        ),
    )
    return str(tmp_path)


def test_top_unshipped_orders_filters_and_revenue(ray_session, tmp_path):
    """All four predicates applied; revenue sums only post-cutoff
    lineitems; descending revenue order."""
    from pynomaly_ray.pipelines.queries import q_top_unshipped_orders

    sf = _q3_tables(tmp_path)
    out = q_top_unshipped_orders(sf)
    # order 13: 200*0.5 + 10 = 110.00 -> 11000; order 10: 100*0.9 = 9000
    assert out["o_orderkey"].tolist() == [13, 10]
    assert out["sum_revenue_cents"].tolist() == [11000, 9000]
    day = pd.Timestamp("1997-06-01").value // 1000 // 86_400_000_000
    assert out["order_day"].tolist() == [day, day]


def test_top_unshipped_orders_empty_segment(ray_session, tmp_path):
    """No customer in the segment -> empty result with stable columns."""
    from pynomaly_ray.pipelines.queries import q_top_unshipped_orders

    sf = _q3_tables(tmp_path)
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1], np.int64),
            "c_mktsegment": ["MACHINERY"],
        }
    )
    _write(tmp_path, "customer", cust)
    out = q_top_unshipped_orders(sf)
    assert len(out) == 0
    assert list(out.columns) == ["o_orderkey", "order_day", "sum_revenue_cents"]


def test_late_orders_boundary_and_orphans(ray_session, tmp_path):
    """Exactly-90-days ships are NOT late (strict >); orders without
    lineitems never count; one late lineitem suffices (EXISTS, not
    per-line count)."""
    from pynomaly_ray.pipelines.queries import q_late_orders

    us = pa.timestamp("us")
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.array([1, 2, 3], np.int64),
                "o_orderdate": pd.to_datetime(["2000-01-01"] * 3),
                "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
            }
        ),
        schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_orderdate", us),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
    _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": np.array([1, 1, 2], np.int64),
                "l_shipdate": pd.to_datetime(
                    [
                        "2000-05-01",  # order 1: late (121 days)
                        "2000-01-02",  # order 1: on-time line, irrelevant
                        "2000-03-31",  # order 2: exactly +90 days -> NOT late
                    ]
                ),
            }
        ),
        schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_shipdate", us)]
        ),
    )
    out = q_late_orders(str(tmp_path))
    assert out["o_orderpriority"].tolist() == ["1-URGENT"]
    assert out["n_late"].tolist() == [1]


def test_fully_pruned_read_through_exchange(ray_session, tmp_path):
    """A pushdown filter that prunes EVERY row leaves 0-row blocks with
    no schema at all (Ray skips map fns on empty blocks).  The exchange
    layer and driver collectors must survive the mix: hash_aggregate ->
    collect_sorted and hash_join(inner) -> topk both yield empty, typed
    results instead of KeyErrors."""
    import pyarrow.dataset as pads

    from pynomaly_ray.functions.exchange import (
        collect_sorted,
        hash_aggregate,
        hash_join,
        topk,
    )
    from pynomaly_ray.sources.parquet import read_parquet_clean

    path = os.path.join(tmp_path, "t.parquet")
    papq.write_table(
        pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int64()),
                "v": pa.array([10, 20, 30], pa.int64()),
            }
        ),
        path,
    )
    empty = read_parquet_clean(path, filter=pads.field("k") > 100)

    agg = hash_aggregate(
        empty,
        ["k"],
        lambda df: df.groupby("k", sort=False)["v"].sum().reset_index(),
    )
    out = collect_sorted(agg, ["k"])
    assert len(out) == 0

    full = read_parquet_clean(path)
    joined = hash_join(empty, full, ["k"])
    res = topk(joined, ["v"], 5, descending=[True])
    assert len(res) == 0

    # the reverse orientation (typed left, schemaless right) too
    joined2 = hash_join(full, empty, ["k"])
    res2 = topk(joined2, ["v"], 5, descending=[True])
    assert len(res2) == 0

    # non-inner modes: a schemaless ROW-PRESERVING side is still a
    # well-defined 0-row result; only a schemaless null-extended side
    # (whose columns must pad surviving typed rows) raises
    left_pruned = hash_join(empty, full, ["k"], how="left")
    assert len(topk(left_pruned, ["v"], 5, descending=[True])) == 0
    with pytest.raises(Exception, match="null-extended"):
        hash_join(full, empty, ["k"], how="left").materialize()


def test_blocklist_filter_token_exact(ray_session, tmp_path):
    """Blocklist matches whole whitespace tokens only: 'merged' and
    'merge?' are NOT the blocklist token 'merge'."""
    from pynomaly_ray.pipelines.queries import q_blocklist_filter

    sf = _docs(
        tmp_path,
        [
            (1, "good text here", "s1"),
            (2, "contains spark word", "s1"),
            (3, "dup", "s2"),
            (4, "merged not merge?", "s2"),
        ],
    )
    out = q_blocklist_filter(sf).set_index("source")
    assert out.loc["s1", "kept"] == 1 and out.loc["s1", "dropped"] == 1
    assert out.loc["s2", "kept"] == 1 and out.loc["s2", "dropped"] == 1


def test_winnow_fingerprints_hand_checked(ray_session, tmp_path):
    """k=3/w=4 winnowing on hand-computable docs: increasing shingles
    select one min per window (3 distinct), constant docs collapse to
    one fingerprint, docs with fewer than w full windows of shingles
    are excluded, and adjacent docs never share windows."""
    from pynomaly_ray.pipelines.queries import q_winnow_fingerprints

    sf = _docs(
        tmp_path,
        [
            (1, "a b c d e f g h", "s"),  # 6 shingles, 3 windows -> 3 fps
            (2, "z z z z z z z", "s"),    # 5 equal shingles -> 1 fp
            (3, "a b c d e f", "s"),      # 4 shingles, 1 window -> 1 fp
            (4, "a b c d e", "s"),        # 3 shingles < w -> excluded
            (5, "", "s"),                 # no tokens -> excluded
        ],
    )
    out = q_winnow_fingerprints(sf)
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_sh"].tolist() == [6, 5, 4]
    assert out["n_fp"].tolist() == [3, 1, 1]


def test_source_divergence_hand_checked(ray_session, tmp_path):
    """TVD vs the corpus distribution, absent-token closed form
    included: A={x:2,y:1}, B={x:1,z:1}; tot=5, ct={x:3,y:1,z:1}.
    TVD(A) = (|10-9| + |5-3| + 1*3) / 30 = 6/30 = 0.2;
    TVD(B) = (|5-6| + |5-2| + 1*2) / 20 = 6/20 = 0.3."""
    from pynomaly_ray.pipelines.queries import q_source_divergence

    sf = _docs(tmp_path, [(1, "x x y", "A"), (2, "x z", "B")])
    out = q_source_divergence(sf).set_index("source")
    assert out.loc["A", "tvd_e6"] == 200000
    assert out.loc["B", "tvd_e6"] == 300000


def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[len(b)]


def test_editdist_le1_kernel_vs_dp():
    """Vectorized <=1 kernel agrees with a reference DP on hand cases
    (incl. the 'ab'/'ba' shared-variant-but-distance-2 trap, unicode,
    and empty strings) and on a random fuzz."""
    import random

    from pynomaly_ray.stages.dedup import editdist_le1

    ta = ["abc", "abc", "abc", "ab", "ba", "abcd", "aéc", "", "a"]
    tb = ["abc", "abd", "xbd", "abc", "ab", "abc", "aéd", "a", ""]
    got = list(editdist_le1(ta, tb))
    want = [min(_lev_ref(a, b), 2) for a, b in zip(ta, tb)]
    assert got == want
    rng = random.Random(11)
    pairs = [
        (
            "".join(rng.choice("abéc") for _ in range(rng.randint(0, 8))),
            "".join(rng.choice("abéc") for _ in range(rng.randint(0, 8))),
        )
        for _ in range(2000)
    ]
    got = editdist_le1([p[0] for p in pairs], [p[1] for p in pairs])
    for (a, b), g in zip(pairs, got):
        assert g == min(_lev_ref(a, b), 2), (a, b)


def test_editdist_pairs_planted(ray_session, tmp_path):
    """Candidates come only from shared deletion variants; the verify
    kill the 'ab x y'/'ba x y' transposition false candidate; distance
    0 (identical titles) and 1 (one substitution / one deletion) pairs
    survive with their exact distance."""
    from pynomaly_ray.pipelines.queries import q_editdist_pairs

    sf = _docs(
        tmp_path,
        [
            (1, "the fast key tail tail tail", "s"),
            (2, "the fast key other words here", "s"),   # identical title -> 0
            (3, "the fast kex trailing junk words", "s"), # 1 substitution
            (4, "the fast ke words words words", "s"),    # 1 deletion
            (5, "eht fast key a b c", "s"),               # far -> no pair
        ],
    )
    out = q_editdist_pairs(sf)
    pairs = set(zip(out["doc_a"], out["doc_b"], out["dist"]))
    assert (1, 2, 0) in pairs
    assert (1, 3, 1) in pairs and (2, 3, 1) in pairs
    assert (1, 4, 1) in pairs and (2, 4, 1) in pairs
    assert not any(5 in (a, b) for a, b, _ in pairs)
    # 3 vs 4: 'the fast kex' vs 'the fast ke' -> distance 1 as well
    assert (3, 4, 1) in pairs


def test_winsorized_stats_hand_checked(ray_session, tmp_path):
    """Nearest-rank p05/p95 on n=20 distinct values 1..20: lo = rank 1
    (value 1), hi = rank 19 (value 19); winsorized sum clamps only the
    max: 1+..+19 + 19 = 209."""
    from pynomaly_ray.pipelines.queries import q_winsorized_stats

    df = pd.DataFrame(
        {
            "event_type": ["t"] * 20,
            "value": [float(i) for i in range(1, 21)],
        }
    )
    _write(tmp_path, "events", df)
    out = q_winsorized_stats(str(tmp_path))
    assert out["n"].tolist() == [20]
    assert out["lo_e6"].tolist() == [1_000_000]
    assert out["hi_e6"].tolist() == [19_000_000]
    assert out["wsum_e6"].tolist() == [209_000_000]


def test_embedding_gram_hand_checked(ray_session, tmp_path):
    """Two 2-dim-nonzero vectors: gram entries are exact e6 products."""
    from pynomaly_ray.pipelines.queries import q_embedding_gram

    dim = 64
    v1 = [0.0] * dim
    v2 = [0.0] * dim
    v1[0], v1[1] = 0.5, 0.25
    v2[0], v2[1] = -0.5, 0.125
    df = pd.DataFrame({"vec_id": np.array([1, 2], np.int64), "embedding": [v1, v2]})
    _write(
        tmp_path,
        "embeddings",
        df,
        schema=pa.schema(
            [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
        ),
    )
    out = q_embedding_gram(str(tmp_path)).set_index(["dim_i", "dim_j"])
    assert out.loc[(1, 1), "sum_prod_e12"] == 500000**2 + 500000**2
    assert out.loc[(1, 2), "sum_prod_e12"] == 500000 * 250000 - 500000 * 125000
    assert out.loc[(2, 2), "sum_prod_e12"] == 250000**2 + 125000**2
    assert (out["n"] == 2).all()
    assert len(out) == dim * (dim + 1) // 2


def test_late_events_simulated_arrival(ray_session, tmp_path):
    """Differential check vs a naive per-user replay: sort by the
    simulated (knuth32) arrival, run a running max of ts, count events
    more than 300 s behind it."""
    from pynomaly_ray.functions.hashing import knuth32
    from pynomaly_ray.pipelines.queries import q_late_events

    rng = np.random.default_rng(5)
    n = 400
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 8, n).astype(np.int64),
            "event_type": "t",
            "value": 1.0,
            "ts": pd.to_datetime(
                np.sort(rng.integers(0, 10**6, n)) * 10**6, unit="ns"
            ),
            "props": "{}",
        }
    )
    _write(tmp_path, "events", ev)
    out = q_late_events(str(tmp_path)).set_index("user_id")

    arr = knuth32(ev["event_id"].to_numpy())
    want = {}
    for uid, grp in ev.assign(arrival=arr).groupby("user_id"):
        g = grp.sort_values(["arrival", "event_id"])
        ts = g["ts"].astype("int64").to_numpy()
        best, late = -(2**62), 0
        for x in ts:
            if best - 300_000_000 > x:
                late += 1
            best = max(best, x)
        if late:
            want[uid] = (len(g), late)
    assert len(out) == len(want) > 0
    for uid, (ne, nl) in want.items():
        assert out.loc[uid, "n_events"] == ne
        assert out.loc[uid, "n_late"] == nl


def test_customer_returns_hand_checked(ray_session, tmp_path):
    """Q10 shape: only R-flagged lineitems of in-window orders count;
    revenue aggregates across a customer's orders; nation name attaches
    from the broadcast dict."""
    from pynomaly_ray.pipelines.queries import q_customer_returns

    us = pa.timestamp("us")
    _write(
        tmp_path,
        "nation",
        pd.DataFrame(
            {
                "n_nationkey": np.array([7], np.int64),
                "n_name": ["FRANCE"],
                "n_regionkey": np.array([1], np.int64),
            }
        ),
    )
    _write(
        tmp_path,
        "customer",
        pd.DataFrame(
            {
                "c_custkey": np.array([1, 2], np.int64),
                "c_name": ["alice", "bob"],
                "c_nationkey": np.array([7, 7], np.int64),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.array([10, 11, 12], np.int64),
                "o_custkey": np.array([1, 1, 2], np.int64),
                "o_orderdate": pd.to_datetime(
                    ["1997-02-01", "1996-12-31", "1997-03-31"]
                ),
            }
        ),
        schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderdate", us),
            ]
        ),
    )
    _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": np.array([10, 10, 11, 12], np.int64),
                "l_extendedprice": [100.0, 50.0, 999.0, 20.0],
                "l_discount": [0.1, 0.0, 0.0, 0.5],
                "l_returnflag": ["R", "N", "R", "R"],
            }
        ),
    )
    out = q_customer_returns(str(tmp_path))
    # cust 1: order 10 only (11 out of window), R line: 100*0.9 = 9000c
    # cust 2: order 12: 20*0.5 = 1000c
    assert out["c_custkey"].tolist() == [1, 2]
    assert out["rev_cents"].tolist() == [9000, 1000]
    assert out["n_name"].tolist() == ["FRANCE", "FRANCE"]
    assert out["c_name"].tolist() == ["alice", "bob"]


def test_top_quartile_docs_hand_checked(ray_session, tmp_path):
    """Nearest-rank p75 of 1..8 is rank ceil(0.75*8)=6 -> value 6;
    kept = values >= 6 -> 3 docs."""
    from pynomaly_ray.pipelines.queries import q_top_quartile_docs

    rows = [(i, "x " * i, "s") for i in range(1, 9)]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    df["lang"] = "en"
    df["n_chars"] = np.arange(1, 9, dtype=np.int64)
    _write(tmp_path, "documents", df)
    out = q_top_quartile_docs(str(tmp_path))
    assert out["p75_chars"].tolist() == [6]
    assert out["n_kept"].tolist() == [3]


def test_weighted_sample_deterministic(ray_session, tmp_path):
    """The keep decision is a pure function of (doc_id, n_chars):
    re-running yields identical aggregates, and a doc with n_chars=0
    can never be kept (threshold 0)."""
    from pynomaly_ray.pipelines.queries import q_weighted_sample

    rows = [(i, "t", "s") for i in range(100)]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    df["lang"] = "en"
    nch = np.zeros(100, dtype=np.int64)
    nch[50:] = 40000  # threshold 4095 -> always kept
    df["n_chars"] = nch
    _write(tmp_path, "documents", df)
    out1 = q_weighted_sample(str(tmp_path))
    out2 = q_weighted_sample(str(tmp_path))
    pd.testing.assert_frame_equal(out1, out2)
    assert out1["n_kept"].tolist() == [50]
    assert out1["chars_kept"].tolist() == [50 * 40000]


def test_small_qty_revenue_integer_predicate(ray_session, tmp_path):
    """qty < 0.2*avg evaluated as 5*qty*cnt < sum: part 1 has
    quantities (1, 10, 10, 10) -> avg 7.75, 0.2*avg = 1.55; only the
    qty-1 row qualifies.  qty exactly AT the threshold is excluded
    (strict <): part 2 has (1, 4) -> 0.2*avg = 0.5, neither row is
    below it."""
    from pynomaly_ray.pipelines.queries import q_small_qty_revenue

    li = pd.DataFrame(
        {
            "l_partkey": np.array([1, 1, 1, 1, 2, 2], np.int64),
            "l_quantity": np.array([1, 10, 10, 10, 1, 4], np.float64),
            "l_extendedprice": np.array(
                [5.0, 100.0, 100.0, 100.0, 7.0, 7.0], np.float64
            ),
        }
    )
    _write(tmp_path, "lineitem", li)
    part = pd.DataFrame(
        {
            "p_partkey": np.array([1, 2], np.int64),
            "p_brand": ["Brand#23", "Brand#23"],
        }
    )
    _write(tmp_path, "part", part)
    out = q_small_qty_revenue(str(tmp_path))
    assert out["rev_cents"].tolist() == [500]
    assert out["n_items"].tolist() == [1]


def test_big_orders_having_boundary(ray_session, tmp_path):
    """sum_qty must be STRICTLY greater than the threshold: an order
    summing exactly 150 is excluded even when split across blocks."""
    from pynomaly_ray.pipelines.queries import q_big_orders

    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1] * 3 + [2] * 2, np.int64),
            "l_quantity": np.array([50, 50, 50, 100, 51], np.float64),
        }
    )
    _write(tmp_path, "lineitem", li)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2], np.int64),
            "o_custkey": np.array([7, 7], np.int64),
            "o_orderdate": pd.to_datetime(["1997-01-01", "1997-01-02"]),
            "o_totalprice": [10.0, 20.0],
        }
    )
    _write(tmp_path, "orders", orders)
    cust = pd.DataFrame(
        {"c_custkey": np.array([7], np.int64), "c_name": ["alice"]}
    )
    _write(tmp_path, "customer", cust)
    out = q_big_orders(str(tmp_path))
    assert out["o_orderkey"].tolist() == [2]
    assert out["sum_qty"].tolist() == [151]
    assert out["c_name"].tolist() == ["alice"]


def test_idle_rich_customers_window_and_mean(ray_session, tmp_path):
    """Above-GLOBAL-mean test among positive balances (100, 200, 300 ->
    mean 200; only 300 is strictly above), then the lapsed filter: a
    customer with a 2001 order is dropped, one whose orders are all
    older survives."""
    from pynomaly_ray.pipelines.queries import q_idle_rich_customers

    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2, 3, 4], np.int64),
            "c_acctbal": [100.0, 200.0, 300.0, 300.0],
            "c_mktsegment": ["A", "A", "A", "B"],
        }
    )
    _write(tmp_path, "customer", cust)
    orders = pd.DataFrame(
        {
            "o_custkey": np.array([3, 4], np.int64),
            "o_orderdate": pd.to_datetime(["2001-02-01", "2000-12-31"]),
        }
    )
    _write(tmp_path, "orders", orders)
    out = q_idle_rich_customers(str(tmp_path))
    assert out["c_mktsegment"].tolist() == ["B"]
    assert out["n_cust"].tolist() == [1]
    assert out["bal_cents"].tolist() == [30000]


def test_cdc_merge_tombstone_resurrect_tiebreak(ray_session, tmp_path):
    """Last entry per key wins in (ts, event_id) order: user 1 is
    deleted then re-upserted at the same ts (higher event_id wins ->
    survives with the new value); user 2's last entry is the tombstone
    (dropped); user 3 never appears in the log (passes through)."""
    from pynomaly_ray.pipelines.queries import q_cdc_merge

    ev = pd.DataFrame(
        {
            "event_id": np.array([0, 1, 2, 3], np.int64),
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-01", "2024-01-02", "2024-01-03"]
            ),
            "user_id": np.array([1, 1, 2, 2], np.int64),
            "event_type": ["error", "click", "click", "error"],
            "value": [0.0, 7.5, 1.0, 0.0],
        }
    )
    _write(tmp_path, "events", ev)
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2, 3], np.int64),
            "c_acctbal": [10.0, 20.0, 30.0],
        }
    )
    _write(tmp_path, "customer", cust)
    out = q_cdc_merge(str(tmp_path))
    assert out["user_id"].tolist() == [1, 3]
    assert out["bal_cents"].tolist() == [750, 3000]
    assert out["src"].tolist() == ["updated", "unchanged"]
