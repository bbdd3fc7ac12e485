"""Round-5 wave-10 operators: cross-source text sharing, event-type
co-occurrence pairs, inverted index, and CSV/JSONL ingest round trips —
handcrafted semantics the sf oracles cannot pin (NUL-bearing keys,
tie-breaks at the top-k boundary, single-type users, format edges)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as papq


def _write(tmp_path, table: str, df: pd.DataFrame) -> str:
    papq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(tmp_path, f"{table}.parquet"),
    )
    return str(tmp_path)


def test_cross_source_texts_sharing_and_nul(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_cross_source_texts

    # "dup" appears in A and B (shared); "a\x00x" vs "a\x00y" differ
    # only after an embedded NUL and must NOT count as one text.
    sf = _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5, 6],
                "text": ["dup", "a\x00x", "a\x00y", "dup", "dup", "only_b"],
                "source": ["A", "A", "A", "A", "B", "B"],
            }
        ),
    )
    out = q_cross_source_texts(sf).set_index("source")
    # A: 4 docs, texts {dup, a\x00x, a\x00y} -> 3 distinct, dup shared
    assert out.loc["A", "n_docs"] == 4
    assert out.loc["A", "n_texts"] == 3
    assert out.loc["A", "n_shared"] == 1
    # B: 2 docs, texts {dup, only_b}, dup shared
    assert out.loc["B", "n_docs"] == 2
    assert out.loc["B", "n_texts"] == 2
    assert out.loc["B", "n_shared"] == 1


def test_event_type_pairs_handcrafted(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_event_type_pairs

    # user 1: {a, b, c} -> ab, ac, bc; user 2: {a, b} (b twice, counted
    # once) -> ab; user 3: {c} alone -> nothing.
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2, 2, 2, 3],
                "event_type": ["a", "b", "c", "a", "b", "b", "c"],
            }
        ),
    )
    out = q_event_type_pairs(sf)
    got = {
        (r.type_a, r.type_b): r.n_users for r in out.itertuples(index=False)
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_inverted_index_postings_and_ties(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_inverted_index

    # 7 docs contain "the" (df=7, postings capped at 5 smallest ids);
    # "zz" and "aa" tie at df=2 -> token asc breaks the tie.
    docs = [(i, "the filler%d" % i) for i in range(10, 17)]
    docs += [(1, "aa zz"), (2, "aa zz")]
    sf = _write(
        tmp_path,
        "documents",
        pd.DataFrame(docs, columns=["doc_id", "text"]),
    )
    out = q_inverted_index(sf)
    the = out[out["token"] == "the"]
    assert list(the["df"]) == [7] * 5
    assert list(the["doc_id"]) == [10, 11, 12, 13, 14]
    assert list(the["rank"]) == [1, 2, 3, 4, 5]
    # global order: df desc then token asc -> "the" first, then "aa", "zz"
    order = out["token"].drop_duplicates().tolist()
    assert order[0] == "the"
    assert order.index("aa") < order.index("zz")


def test_ingest_csv_roundtrip(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_ingest_csv

    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "event_type": ["buy", "buy", "view", "view"],
                # 1.005 is 1.00499.. in float64 -> floor(x*100+.5) = 100,
                # the documented _cents contract on BOTH sides; nan -> 0
                "value": [1.005, 2.0, 0.004, np.nan],
            }
        ),
    )
    out = q_ingest_csv(sf).set_index("event_type")
    assert out.loc["buy", "n"] == 2 and out.loc["buy", "cents"] == 300
    assert out.loc["view", "n"] == 2 and out.loc["view", "cents"] == 0


def test_ingest_jsonl_roundtrip(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_ingest_jsonl

    sf = _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "lang": ["en", "en", "de"],
                "source": ["s1", "s1", "s2"],
                "n_chars": [10, 20, 5],
            }
        ),
    )
    out = q_ingest_jsonl(sf)
    got = {
        (r.lang, r.source): (r.n_docs, r.chars)
        for r in out.itertuples(index=False)
    }
    assert got == {("en", "s1"): (2, 30), ("de", "s2"): (1, 5)}


def test_user_activity_histogram_handcrafted(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_user_activity_histogram

    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame({"user_id": [1, 1, 1, 2, 3, 3, 4]}),
    )
    out = q_user_activity_histogram(sf)
    got = dict(zip(out["n_events"], out["n_users"]))
    assert got == {1: 2, 2: 1, 3: 1}


def test_value_histogram_degenerate_and_nulls(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_value_histogram

    # type "flat": all values equal -> mx==mn -> every row lands in bin 0
    # (width mx-mn+1 = 1); nulls excluded entirely.
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_type": ["flat", "flat", "wide", "wide", "wide"],
                "value": [2.0, 2.0, 0.0, 1.0, None],
            }
        ),
    )
    out = q_value_histogram(sf)
    flat = out[out["event_type"] == "flat"]
    assert list(flat["bin"]) == [0] and list(flat["n"]) == [2]
    wide = out[out["event_type"] == "wide"]
    # ve 0 and 1e6 over width 1e6+1: bins 0 and 7
    assert list(wide["bin"]) == [0, 7] and list(wide["n"]) == [1, 1]


def test_percent_rank_ties_and_single(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_percent_rank_values

    # type "a": values [1,1,2,3] -> ranks 1,1,3,4; n=4 ->
    # pr_e6 = 0, (3-1)*1e6//3 = 666666, (4-1)*1e6//3 = 1000000.
    # type "b": single row -> pr_e6 = 0.
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_type": ["a", "a", "a", "a", "b"],
                "value": [1.0, 1.0, 2.0, 3.0, 9.0],
            }
        ),
    )
    out = q_percent_rank_values(sf)
    a = out[out["event_type"] == "a"]
    assert list(a["pr_e6"]) == [0, 666666, 1000000]
    b = out[out["event_type"] == "b"]
    assert list(b["pr_e6"]) == [0]


def test_cube_revenue_lattice(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_cube_revenue

    sf = _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            {
                "l_returnflag": ["A", "A", "R"],
                "l_linestatus": ["F", "O", "F"],
                "l_extendedprice": [1.0, 2.0, 4.0],
            }
        ),
    )
    out = q_cube_revenue(sf)
    got = {
        (r.l_returnflag, r.l_linestatus): (r.n, r.cents)
        for r in out.itertuples(index=False)
    }
    assert got[("A", "F")] == (1, 100)
    assert got[("A", "ALL")] == (2, 300)
    assert got[("ALL", "F")] == (2, 500)
    assert got[("ALL", "ALL")] == (3, 700)
    assert len(got) == 3 + 2 + 2 + 1  # detail + both marginals + total


def test_source_doc_sample_small_groups(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_source_doc_sample

    sf = _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": [5, 3, 9, 1, 7],
                "source": ["x", "x", "x", "x", "y"],
            }
        ),
    )
    out = q_source_doc_sample(sf).set_index("source")
    assert out.loc["x", "sample_ids"] == "1,3,5"
    assert out.loc["y", "sample_ids"] == "7"


def test_mg_prune_properties():
    from pynomaly_ray.functions.sketches import mg_prune

    toks = np.array(["a", "b", "c", "d", "e"])
    cnts = np.array([100, 40, 30, 20, 10])
    t, c = mg_prune(toks, cnts, 2)
    # threshold = 3rd largest (30): a->70, b->10, rest dropped
    assert list(t) == ["a", "b"] and list(c) == [70, 10]
    # under capacity: identity
    t, c = mg_prune(toks, cnts, 5)
    assert list(t) == list(toks) and list(c) == list(cnts)
    # boundary ties all drop (deterministic, possibly < k kept)
    t, c = mg_prune(np.array(["x", "y", "z"]), np.array([5, 5, 5]), 2)
    assert len(t) == 0


def test_mg_heavy_hitters_undercount_bound(ray_session, tmp_path):
    from pynomaly_ray.pipelines.engine_queries import q_mg_heavy_hitters

    # one dominant token + noise: the heavy hitter must survive with a
    # one-sided underestimate within the two-level prune bound 2N/(K+1).
    docs = [(i, "hot hot hot hot noise%d" % (i % 50)) for i in range(200)]
    sf = _write(
        tmp_path,
        "documents",
        pd.DataFrame(docs, columns=["doc_id", "text"]),
    )
    out = q_mg_heavy_hitters(sf).set_index("token")
    n_total = 200 * 5
    assert "hot" in out.index
    est, exact = out.loc["hot", "est"], out.loc["hot", "exact"]
    assert exact == 800
    assert est <= exact
    assert exact - est <= 2 * n_total // (32 + 1) + 1
    # every reported estimate is one-sided
    assert (out["est"] <= out["exact"]).all()


def test_label_centroids_negative_floor(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_label_centroids

    # label 1: vectors [-1.0, 0.5] and [0.0, 0.5] -> sums (-1e6, 1e6),
    # n=2 -> floor(-1e6/2) = -500000 (floor, not truncate-toward-zero).
    # label 2: single vector, sum -3 -> floor(-3/1) = -3.
    sf = _write(
        tmp_path,
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": [1, 2, 3],
                "embedding": [[-1.0, 0.5], [0.0, 0.5], [-0.000003, 1.0]],
                "label": [1, 1, 2],
            }
        ),
    )
    out = q_label_centroids(sf)
    got = {
        (r.label, r.pos): (r.n, r.cent_e6) for r in out.itertuples(index=False)
    }
    assert got[(1, 0)] == (2, -500000)
    assert got[(1, 1)] == (2, 500000)
    assert got[(2, 0)] == (1, -3)
    assert got[(2, 1)] == (1, 1000000)


def test_event_transitions_tie_and_boundaries(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_event_transitions

    ts = pd.to_datetime(
        [
            "2026-01-01 00:00:00",
            "2026-01-01 00:00:00",  # tie with row 0 -> event_id order
            "2026-01-01 00:00:05",
            "2026-01-02 00:00:00",  # other user: single event, no pair
        ]
    ).astype("datetime64[us]")
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2],
                "event_id": [11, 10, 12, 13],  # tie resolves 10 -> 11
                "ts": ts,
                "event_type": ["b", "a", "c", "z"],
            }
        ),
    )
    out = q_event_transitions(sf)
    got = {
        (r.from_type, r.to_type): r.n for r in out.itertuples(index=False)
    }
    assert got == {("a", "b"): 1, ("b", "c"): 1}


def test_cli_ingest_and_query(ray_session, tmp_path, capsys):
    import json

    import pyarrow.csv as pcsv
    import pyarrow.parquet as papq

    from pynomaly_ray.cli import main

    src = tmp_path / "in.csv"
    pcsv.write_csv(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "lang": ["en", "de", "en"],
                "extra": [9, 9, 9],
            }
        ),
        str(src),
    )
    out = tmp_path / "converted"
    rc = main(
        [
            "ingest",
            "--input",
            str(src),
            "--out",
            str(out),
            "--format",
            "csv",
            "--columns",
            "doc_id,lang",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] == 3
    back = papq.read_table(str(out))
    assert sorted(back.column_names) == ["doc_id", "lang"]

    # query by name over an sf-style dir, result written as parquet
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame({"user_id": [1, 1, 2]}),
    )
    qout = tmp_path / "q.parquet"
    rc = main(
        [
            "query",
            "--name",
            "user_activity_histogram",
            "--input",
            sf,
            "--out",
            str(qout),
        ]
    )
    assert rc == 0
    res = papq.read_table(str(qout)).to_pandas()
    assert dict(zip(res["n_events"], res["n_users"])) == {1: 1, 2: 1}

    # unknown name exits 2 and lists the registry
    rc = main(["query", "--name", "nope_not_a_query", "--input", sf])
    assert rc == 2
    listed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "user_activity_histogram" in listed["queries"]

    # known name without --input: usage error, not a traceback
    rc = main(["query", "--name", "user_activity_histogram"])
    assert rc == 2
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "error" in err


def test_bloom_semi_join_handcrafted_and_empty_build(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_bloom_semi_join

    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_totalprice": [500000.0, 100.0, 450000.0],
        }
    )
    line = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 3, 9],
            "l_returnflag": ["A", "R", "A", "A", "A"],
            "l_extendedprice": [1.0, 2.0, 4.0, 8.0, 16.0],
        }
    )
    _write(tmp_path, "orders", orders)
    sf = _write(tmp_path, "lineitem", line)
    out = q_bloom_semi_join(sf).set_index("l_returnflag")
    # orders 1 and 3 qualify; lineitems of order 2 and unknown 9 are out
    assert out.loc["A", "n"] == 2 and out.loc["A", "cents"] == 900
    assert out.loc["R", "n"] == 1 and out.loc["R", "cents"] == 200

    # no qualifying orders -> empty result, not a crash
    _write(tmp_path, "orders", orders.assign(o_totalprice=1.0))
    empty = q_bloom_semi_join(sf)
    assert len(empty) == 0


def test_read_filter_pushdown_parity(ray_session, tmp_path):
    import pyarrow.dataset as pads

    from pynomaly_ray.sources.parquet import read_parquet_clean

    path = _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3, 4],
                "o_totalprice": [10.0, 500000.0, 20.0, 450000.0],
            }
        ),
    )
    ds = read_parquet_clean(
        os.path.join(path, "orders.parquet"),
        columns=["o_orderkey"],
        filter=pads.field("o_totalprice") > 400000.0,
    )
    got = sorted(ds.to_pandas()["o_orderkey"])
    assert got == [2, 4]  # filter column need not be projected


def test_cli_ingest_partition_by(ray_session, tmp_path, capsys):
    import json

    import pyarrow.parquet as papq

    from pynomaly_ray.cli import main

    src = tmp_path / "docs"
    src.mkdir()
    papq.write_table(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "lang": ["en", "de", "en"],
            }
        ),
        str(src / "p.parquet"),
    )
    out = tmp_path / "hive"
    rc = main(
        [
            "ingest",
            "--input",
            str(src),
            "--out",
            str(out),
            "--format",
            "parquet",
            "--partition-by",
            "lang",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] == 3
    # one directory per key; a per-key consumer reads ONE partition
    assert sorted(p.name for p in out.iterdir()) == ["lang=de", "lang=en"]
    en = papq.read_table(str(out / "lang=en")).to_pandas()
    assert sorted(en["doc_id"]) == [1, 3]


def test_cross_source_texts_nul_sources(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_cross_source_texts

    # sources differing only after an embedded NUL must stay distinct,
    # and the text they share must count as shared for BOTH
    sf = _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["same", "same"],
                "source": ["s\x00a", "s\x00b"],
            }
        ),
    )
    out = q_cross_source_texts(sf).set_index("source")
    assert len(out) == 2
    for s in ("s\x00a", "s\x00b"):
        assert out.loc[s, "n_docs"] == 1
        assert out.loc[s, "n_texts"] == 1
        assert out.loc[s, "n_shared"] == 1


def test_event_type_pairs_null_users_excluded(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_event_type_pairs

    # SQL's self-join equality never matches NULL = NULL: the NULL-user
    # events must not produce a pair
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "user_id": pd.array([None, None, 1, 1], dtype="Int64"),
                "event_type": ["a", "b", "a", "b"],
            }
        ),
    )
    out = q_event_type_pairs(sf)
    got = {
        (r.type_a, r.type_b): r.n_users for r in out.itertuples(index=False)
    }
    assert got == {("a", "b"): 1}


def test_user_activity_histogram_null_user_group(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_user_activity_histogram

    # SQL GROUP BY keeps NULL as ONE group: two null-user events = one
    # user at activity level 2
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame({"user_id": pd.array([None, None, 7], dtype="Int64")}),
    )
    out = q_user_activity_histogram(sf)
    got = dict(zip(out["n_events"], out["n_users"]))
    assert got == {1: 1, 2: 1}


def test_event_transitions_null_user_partition(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_event_transitions

    # SQL PARTITION BY groups NULL users into one partition: their
    # consecutive events DO produce transitions
    ts = pd.to_datetime(
        ["2026-01-01 00:00:00", "2026-01-01 00:00:05"]
    ).astype("datetime64[us]")
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "user_id": pd.array([None, None], dtype="Int64"),
                "event_id": [1, 2],
                "ts": ts,
                "event_type": ["a", "b"],
            }
        ),
    )
    out = q_event_transitions(sf)
    got = {
        (r.from_type, r.to_type): r.n for r in out.itertuples(index=False)
    }
    assert got == {("a", "b"): 1}


def test_inverted_index_nul_tokens(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_inverted_index

    # tokens differing only after an embedded NUL keep separate postings
    sf = _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {"doc_id": [1], "text": ["x\x00a x\x00b"]}
        ),
    )
    out = q_inverted_index(sf)
    assert sorted(out["token"]) == ["x\x00a", "x\x00b"]
    assert list(out["df"]) == [1, 1]


def test_mg_heavy_hitters_all_ties_empty(ray_session, tmp_path):
    from pynomaly_ray.pipelines.engine_queries import q_mg_heavy_hitters

    # > K+1 distinct tokens, every count 1: the global prune drops all
    # counters -> empty typed result, not a crash
    docs = [(i, "tok%04d" % i) for i in range(40)]
    sf = _write(
        tmp_path,
        "documents",
        pd.DataFrame(docs, columns=["doc_id", "text"]),
    )
    out = q_mg_heavy_hitters(sf)
    assert len(out) == 0
    assert list(out.columns) == ["token", "est", "exact"]


def test_event_dedup_debounce(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_event_dedup

    ts = pd.to_datetime(
        [
            "2026-01-01 00:00:00",  # kept (first)
            "2026-01-01 00:00:03",  # dup (3s after prev of same type)
            "2026-01-01 00:00:09",  # kept (6s after prev)
            "2026-01-01 00:00:01",  # other type: kept
            "2026-01-01 00:00:02",  # other user, same type: kept
        ]
    ).astype("datetime64[us]")
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1, 2],
                "event_id": [1, 2, 3, 4, 5],
                "ts": ts,
                "event_type": ["a", "a", "a", "b", "a"],
            }
        ),
    )
    out = q_event_dedup(sf).set_index("event_type")
    assert out.loc["a", "n_total"] == 4 and out.loc["a", "n_kept"] == 3
    assert out.loc["b", "n_total"] == 1 and out.loc["b", "n_kept"] == 1


def test_negative_pairs_ring(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_negative_pairs

    sf = _write(
        tmp_path,
        "embeddings",
        pd.DataFrame({"vec_id": list(range(1, 40))}),
    )
    out = q_negative_pairs(sf)
    assert len(out) == 39
    # a total function of the id set: every vec has exactly one partner
    assert set(out["vec_id"]) == set(range(1, 40))
    from pynomaly_ray.functions.hashing import knuth32

    hv = knuth32(np.arange(1, 40))
    buckets = hv % 256
    sizes = pd.Series(buckets).value_counts()
    pair_of = dict(zip(out["vec_id"], out["partner_id"]))
    for vid, partner in pair_of.items():
        b = int(knuth32(np.array([vid]))[0] % 256)
        # partner stays inside the vec's own hash bucket; self-pairing
        # only in singleton buckets
        assert int(knuth32(np.array([partner]))[0] % 256) == b
        if partner == vid:
            assert sizes[b] == 1


def test_vector_norms_exact_grid(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_vector_norms

    sf = _write(
        tmp_path,
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": [1, 2],
                "embedding": [[1.0, 0.0], [0.0, -2.0]],
                "label": [7, 7],
            }
        ),
    )
    out = q_vector_norms(sf).set_index("label")
    # squared e6 norms: 1e12 and 4e12 -> mean 2.5e12
    assert out.loc[7, "n"] == 2
    assert out.loc[7, "mn"] == 10**12
    assert out.loc[7, "mx"] == 4 * 10**12
    assert out.loc[7, "mean_sq"] == 25 * 10**11


def test_user_bursts_window_clamp(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_user_bursts

    ts = pd.to_datetime(
        [
            "2026-01-01 00:00:00",
            "2026-01-01 00:00:01",
            "2026-01-01 00:00:02",
            "2026-01-01 00:00:03",
            "2026-01-02 00:00:00",  # user 2: single event
        ]
    ).astype("datetime64[us]")
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1, 2],
                "event_id": [1, 2, 3, 4, 5],
                "ts": ts,
                "value": [1.0, 10.0, 1.0, 1.0, 5.0],
            }
        ),
    )
    out = q_user_bursts(sf).set_index("user_id")
    # user 1 windows (cents): 100, 1100, 1200, 1200 -> max 1200; the
    # first two windows clamp at the user's first event
    assert out.loc[1, "max_burst_cents"] == 1200
    assert out.loc[2, "max_burst_cents"] == 500
