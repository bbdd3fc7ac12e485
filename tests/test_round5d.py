"""Round-5 wave-8 operators: inter-arrival gaps, MAD outliers, column
profile — handcrafted-input semantics the sf oracles cannot pin
(null handling, even-count lower-median, single-event users)."""

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


def test_event_gaps_handcrafted(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_event_gaps

    ts = pd.to_datetime(
        [
            "2026-01-01 00:00:00",
            "2026-01-01 00:00:10",
            "2026-01-01 00:01:00",
            "2026-01-02 00:00:00",  # user 2: single event -> no gap row
            "2026-01-03 00:00:00",
            "2026-01-03 00:00:00",  # user 3: duplicate ts -> gap 0
        ]
    ).astype("datetime64[us]")
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame({"user_id": [1, 1, 1, 2, 3, 3], "ts": ts}),
    )
    out = q_event_gaps(sf)
    assert list(out["user_id"]) == [1, 3]
    assert list(out["n_gaps"]) == [2, 1]
    assert list(out["total_gap_us"]) == [60_000_000, 0]
    assert list(out["max_gap_us"]) == [50_000_000, 0]


def test_mad_outliers_lower_median_and_nulls(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_mad_outliers

    # 6 non-null values -> lower median (k=(6+1)//2=3rd smallest).
    # v_e6: [1, 2, 3, 4, 5, 1000] -> median=3e6; dev=[2,1,0,1,2,997]e6,
    # lower median of dev = 1e6 (MAD); outlier iff dev > 5e6 -> only 1000.
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_type": ["a", "a", "b", "b", "b", "c", "c"],
                "value": [1.0, 2.0, 3.0, 4.0, 5.0, 1000.0, None],
            }
        ),
    )
    out = q_mad_outliers(sf)
    assert list(out["event_type"]) == ["c"]
    assert list(out["n_out"]) == [1]


def test_table_profile_nulls_and_distinct(ray_session, tmp_path):
    from pynomaly_ray.pipelines import queries as Q

    sf = _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            {
                "l_discount": [0.01, 0.01, None, 0.05],
                "l_extendedprice": [10.0, 20.0, 30.0, 40.0],
                "l_quantity": [1.0, 1.0, 1.0, 1.0],
                "l_tax": [None, None, None, None],
            }
        ),
    )
    out = Q.q_table_profile(sf)
    prof = {r.col_name: r for r in out.itertuples()}
    assert prof["l_discount"].n_rows == 4
    assert prof["l_discount"].n_null == 1
    assert prof["l_discount"].n_distinct == 2
    assert prof["l_discount"].min_e6 == 10_000
    assert prof["l_discount"].max_e6 == 50_000
    assert prof["l_extendedprice"].n_distinct == 4
    assert prof["l_quantity"].n_distinct == 1
    # all-null column: zero values, null min/max (pandas NaN -> <NA>)
    assert prof["l_tax"].n_null == 4
    assert prof["l_tax"].n_distinct == 0
    assert pd.isna(prof["l_tax"].min_e6)


def test_mad_outliers_all_inliers_empty(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_mad_outliers

    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame({"event_type": ["a"] * 5, "value": [1.0, 2.0, 3.0, 4.0, 5.0]}),
    )
    out = q_mad_outliers(sf)
    assert len(out) == 0
    assert list(out.columns) == ["event_type", "n_out"]


# ---------------------------------------------------------------------------
# bigram LM quality score
# ---------------------------------------------------------------------------
def test_bigram_lm_score_handcrafted(ray_session):
    import ray.data as rd

    from pynomaly_ray.stages.lm import bigram_lm_scores

    # corpus: "a b", "a b", "a c", "z" (z: no bigrams, but counts toward
    # unigrams/vocab).  c1: a=3, b=2, c=1, z=1; V=4.
    # bigrams: (a,b) c2=2 twice, (a,c) c2=1 once.
    # p_e6(a,b) = (2+1)*1e6 // (3+4) = 428571
    # p_e6(a,c) = (1+1)*1e6 // (3+4) = 285714
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": ["a b", "a b", "a c", "z"],
            }
        )
    )
    out = (
        bigram_lm_scores(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2, 3]  # doc 4 has no bigram
    assert list(out["n_big"]) == [1, 1, 1]
    assert list(out["p_e6_total"]) == [428571, 428571, 285714]


def test_bigram_lm_score_nul_tokens_distinct(ray_session):
    """Tokens differing only after an embedded NUL must count as
    DIFFERENT unigrams/bigrams (the round-5 NUL-safe hash contract)."""
    import ray.data as rd

    from pynomaly_ray.stages.lm import bigram_lm_scores

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["x a\x00b", "x a\x00c"],
            }
        )
    )
    out = bigram_lm_scores(docs).to_pandas().sort_values("doc_id")
    # c1: x=2, a\0b=1, a\0c=1; V=3; each bigram unique (c2=1):
    # p_e6 = 2*1e6 // (2+3) = 400000 for both docs
    assert list(out["p_e6_total"]) == [400_000, 400_000]
    assert list(out["n_big"]) == [1, 1]


def test_bigram_lm_score_multi_partition(ray_session, monkeypatch):
    """Forced multi-bucket exchanges: global c1/c2/V must be exact when
    occurrence rows spread across many blocks and buckets."""
    import ray.data as rd

    from pynomaly_ray.stages.lm import bigram_lm_scores

    monkeypatch.setenv("PNR_BUCKET_TARGET_BYTES", "4096")
    n = 300
    texts = ["the cat sat"] * n  # every doc identical
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": texts})
    ).repartition(16)
    out = bigram_lm_scores(docs).to_pandas()
    # c1(the)=n, c1(cat)=n, V=3; c2(the,cat)=n, c2(cat,sat)=n
    exp = ((n + 1) * 1_000_000) // (n + 3)
    assert len(out) == n
    assert (out["n_big"] == 2).all()
    assert (out["p_e6_total"] == 2 * exp).all()


# ---------------------------------------------------------------------------
# substring-dedup removal
# ---------------------------------------------------------------------------
def test_duplicate_span_removal_handcrafted(ray_session):
    import ray.data as rd

    from pynomaly_ray.stages.decontam import duplicate_span_removal

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": [
                    "A B C D x y z",     # shares 4-gram "A B C D" with doc 2
                    "p A B C D q",       # same span mid-doc
                    "u v w",             # short (<4 tokens): untouched
                    "r r r r r s t u2",  # within-doc-only repeat: NOT dup
                    "",                  # zero tokens: excluded
                ],
            }
        )
    )
    out = (
        duplicate_span_removal(docs, k=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2, 3, 4]
    # doc 1: tokens A B C D covered (the one dup start at pos 0)
    assert out.loc[0, "text_clean"] == "x y z"
    assert out.loc[0, "n_removed"] == 4
    # doc 2: same span, surrounded by unique tokens
    assert out.loc[1, "text_clean"] == "p q"
    assert out.loc[1, "n_removed"] == 4
    # doc 3: too short for shingles, all kept
    assert out.loc[2, "text_clean"] == "u v w"
    assert out.loc[2, "n_removed"] == 0
    # doc 4: "r r r r" repeats inside ONE doc only -> cross-doc count 1
    assert out.loc[3, "text_clean"] == "r r r r r s t u2"
    assert out.loc[3, "n_removed"] == 0


def test_duplicate_span_removal_overlapping_coverage(ray_session):
    """Two overlapping dup 4-grams must merge into one covered run."""
    import ray.data as rd

    from pynomaly_ray.stages.decontam import duplicate_span_removal

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": [
                    "k1 a b c d e k2",  # dup 4-grams: "a b c d" and "b c d e"
                    "a b c d e",
                ],
            }
        )
    )
    out = (
        duplicate_span_removal(docs, k=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "text_clean"] == "k1 k2"
    assert out.loc[0, "n_removed"] == 5
    assert out.loc[1, "text_clean"] == ""
    assert out.loc[1, "n_removed"] == 5


def test_duplicate_span_removal_multi_partition(ray_session, monkeypatch):
    import ray.data as rd

    from pynomaly_ray.stages.decontam import duplicate_span_removal

    monkeypatch.setenv("PNR_BUCKET_TARGET_BYTES", "4096")
    n = 200
    texts = [
        "copy pasta boiler plate junk" if i % 2 == 0 else f"u{i} v{i} w{i} x{i} y{i}"
        for i in range(n)
    ]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": texts})
    ).repartition(16)
    out = duplicate_span_removal(docs, k=4).to_pandas()
    even = out[out["doc_id"] % 2 == 0]
    odd = out[out["doc_id"] % 2 == 1]
    assert len(out) == n
    assert (even["text_clean"] == "").all()
    assert (even["n_removed"] == 5).all()
    assert (odd["n_removed"] == 0).all()


# ---------------------------------------------------------------------------
# ngram novelty / json field / funnel / upsample
# ---------------------------------------------------------------------------
def test_ngram_novelty_handcrafted(ray_session):
    import ray.data as rd

    from pynomaly_ray.stages.decontam import ngram_novelty_profile

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "a b c d e",      # doc 1: both shingles first-seen here
                    "a b c d x",      # doc 2: "a b c d" seen in doc 1 -> 1/2 novel
                    "q r s",          # <4 tokens: excluded
                ],
            }
        )
    )
    out = (
        ngram_novelty_profile(docs, k=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["n_sh"]) == [2, 2]
    assert list(out["n_novel"]) == [2, 1]
    assert list(out["novelty_e6"]) == [1_000_000, 500_000]


def test_json_field_agg_malformed_and_null(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_json_field_agg

    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_type": ["a", "a", "a", "b"],
                "props": ['{"k": 7}', "not json", None, '{"k": -3}'],
            }
        ),
    )
    out = q_json_field_agg(sf)
    a = out[out["event_type"] == "a"].iloc[0]
    b = out[out["event_type"] == "b"].iloc[0]
    assert (a.n_rows, a.n_k, a.sum_k, a.min_k, a.max_k) == (3, 1, 7, 7, 7)
    assert (b.n_rows, b.n_k, b.sum_k, b.min_k, b.max_k) == (1, 1, -3, -3, -3)


def test_event_funnel_window_boundaries(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_event_funnel

    base = pd.Timestamp("2026-01-01")
    h = pd.Timedelta(hours=1)
    s = pd.Timedelta(seconds=1)
    rows = [
        # user 1: purchase exactly 1h after view -> converted (inclusive)
        (1, base, "view"), (1, base + h, "purchase"),
        # user 2: purchase at the SAME instant -> NOT converted (strict >)
        (2, base, "view"), (2, base, "purchase"),
        # user 3: purchase 1h+1s after view -> outside window
        (3, base, "view"), (3, base + h + s, "purchase"),
        # user 4: purchase BEFORE view -> not converted
        (4, base + h, "view"), (4, base, "purchase"),
        # user 5: view only
        (5, base, "view"),
        # user 6: purchase only (never viewed)
        (6, base, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", df)
    out = q_event_funnel(sf)
    assert out.loc[0, "n_viewers"] == 5
    assert out.loc[0, "n_converted"] == 1


def test_domain_upsample_skewed_sources(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_domain_upsample

    # counts: big=12, mid=5, tiny=1 -> factors: 1, ceil(12/5)=3, capped 4
    src = ["big"] * 12 + ["mid"] * 5 + ["tiny"]
    sf = _write(
        tmp_path,
        "documents",
        pd.DataFrame({"doc_id": np.arange(len(src), dtype=np.int64), "source": src}),
    )
    out = q_domain_upsample(sf)
    per_doc = out.groupby("doc_id").size()
    assert (per_doc.loc[0:11] == 1).all()
    assert (per_doc.loc[12:16] == 3).all()
    assert per_doc.loc[17] == 4  # ceil(12/1)=12 capped at 4
    # copy_idx runs 0..f-1 per doc
    assert list(out[out["doc_id"] == 12]["copy_idx"]) == [0, 1, 2]


# ---------------------------------------------------------------------------
# KS drift / hourly delta
# ---------------------------------------------------------------------------
def test_drift_ks_handcrafted(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_drift_ks

    # click values {1,2}, view values {3,4}: disjoint supports -> KS = 1
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_type": ["click", "click", "view", "view", "error"],
                "value": [1.0, 2.0, 3.0, 4.0, 99.0],
            }
        ),
    )
    out = q_drift_ks(sf)
    assert out.loc[0, "n_click"] == 2
    assert out.loc[0, "n_view"] == 2
    assert out.loc[0, "ks_e6"] == 1_000_000


def test_drift_ks_identical_distributions(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_drift_ks

    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_type": ["click", "view"] * 4,
                "value": [1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0],
            }
        ),
    )
    out = q_drift_ks(sf)
    assert out.loc[0, "ks_e6"] == 0


def test_hourly_delta_gaps_not_zero_filled(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_hourly_delta

    h0 = pd.Timestamp("2026-01-01 00:30:00")
    rows = (
        [("a", h0)] * 3
        + [("a", h0 + pd.Timedelta(hours=1))] * 5
        # hour 2 missing entirely; hour 3 present
        + [("a", h0 + pd.Timedelta(hours=3))] * 2
        + [("b", h0)]  # single hour -> no delta row
    )
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", df)
    out = q_hourly_delta(sf)
    assert list(out["event_type"]) == ["a", "a"]
    # delta vs previous PRESENT hour: 5-3=2, then 2-5=-3 across the gap
    assert list(out["delta"]) == [2, -3]
    assert list(out["n"]) == [5, 2]


# ---------------------------------------------------------------------------
# text normalize / source overlap / collocations
# ---------------------------------------------------------------------------
def test_text_normalize_hostile_unicode_duckdb_parity(ray_session, tmp_path):
    """Arrow utf8proc case-mapping must equal DuckDB lower() on hostile
    inputs — the contract the text_normalize oracle hash depends on."""
    import duckdb

    from pynomaly_ray.pipelines.queries import q_text_normalize, SQL_TEXT_NORMALIZE

    hostile = [
        "  HeLLo \t WORLD \n",
        "ΣΟΦΟΣ ΣΟΦΟΣ",          # final-sigma handling
        "İstanbul I ı",          # Turkish dotted/dotless
        "STRASSE ß",             # sharp s
        "ＦＵＬＬ　Ｗｉｄｔｈ",   # full-width forms + ideographic space
        "a\x00B c",              # embedded NUL
        None,
        "",
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(len(hostile), dtype=np.int64), "text": hostile}
    )
    sf = _write(tmp_path, "documents", df)
    eng = q_text_normalize(sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    sql = con.execute(SQL_TEXT_NORMALIZE).df()
    assert list(eng["text_norm"]) == list(sql["text_norm"])
    assert list(eng["n_chars_norm"]) == list(sql["n_chars_norm"])
    # the ideographic space U+3000 is NOT in the ASCII class: preserved
    assert "　" in eng.loc[4, "text_norm"]
    assert eng.loc[0, "text_norm"] == "hello world"


def test_source_overlap_handcrafted(ray_session):
    import ray.data as rd

    from pynomaly_ray.stages.text import source_vocab_overlap

    docs = rd.from_arrow(
        pa.table(
            {
                "source": ["A", "A", "B", "C"],
                "text": ["x y z", "x q", "x y", "nope"],
            }
        )
    )
    out = (
        source_vocab_overlap(docs)
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    # vocab: A={x,y,z,q}(4), B={x,y}(2), C={nope}(1)
    # pairs with intersection: (A,B) inter=2 -> j = 2/(4+2-2) = 0.5
    assert list(out["src_a"]) == ["A"]
    assert list(out["src_b"]) == ["B"]
    assert list(out["inter"]) == [2]
    assert list(out["jaccard_e6"]) == [500_000]


def test_source_overlap_nul_tokens_distinct(ray_session):
    import ray.data as rd

    from pynomaly_ray.stages.text import source_vocab_overlap

    docs = rd.from_arrow(
        pa.table(
            {
                "source": ["A", "B"],
                "text": ["a\x00b common", "a\x00c common"],
            }
        )
    )
    out = source_vocab_overlap(docs)
    # only 'common' is shared; the NUL-divergent tokens must NOT alias
    assert list(out["inter"]) == [1]
    assert list(out["jaccard_e6"]) == [1_000_000 // 3]


def test_bigram_collocations_tiebreak_and_lift(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_bigram_collocations

    # "b b" and "a a" both occur twice -> tie broken by (w1, w2) asc;
    # corpus: doc1 = "a a a", doc2 = "b b b"  -> bigrams: (a,a)x2, (b,b)x2
    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a a a", "b b b"]}
    )
    sf = _write(tmp_path, "documents", df)
    out = q_bigram_collocations(sf)
    assert list(out["w1"]) == ["a", "b"]
    assert list(out["n_pair"]) == [2, 2]
    # N=4 bigrams, c1(a)=3: lift(a,a) = 2*4*1e6 // 9 = 888888
    assert list(out["lift_e6"]) == [888_888, 888_888]


# ---------------------------------------------------------------------------
# hourly active users / retention cohorts
# ---------------------------------------------------------------------------
def test_retention_cohorts_handcrafted(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_retention_cohorts

    wk = pd.Timedelta(days=7)
    base = pd.Timestamp("2026-01-01")
    rows = [
        (1, base), (1, base + wk), (1, base + 3 * wk),   # offsets 0,1,3
        (1, base + pd.Timedelta(hours=2)),               # same week dup
        (2, base + wk), (2, base + wk),                  # cohort wk+1, offset 0
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", df)
    out = q_retention_cohorts(sf)
    w0 = int(base.value // 1000) // (7 * 86_400_000_000)
    got = {
        (r.cohort_week, r.week_offset): r.n_users for r in out.itertuples()
    }
    # user 1's cohort week (calendar-derived) has offsets 0,1,3 once each
    assert got[(w0, 0)] == 1 and got[(w0, 1)] == 1 and got[(w0, 3)] == 1
    assert sum(got.values()) == 4


def test_hourly_active_users_dedup(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_hourly_active_users

    h = pd.Timedelta(hours=1)
    base = pd.Timestamp("2026-01-01")
    rows = [(1, base), (1, base), (2, base), (1, base + h)]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    sf = _write(tmp_path, "events", df)
    out = q_hourly_active_users(sf)
    assert list(out["n_users"]) == [2, 1]
