"""Wave-26 tests: cumulative distinct, hopping windows, bounded SSSP,
pagination, and the Gopher-style quality rule."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as papq

SF = "/root/testdata/sf0.001"


def test_cumulative_unique_users_invariants(ray_session):
    from pynomaly_ray.pipelines.queries_wave26 import (
        q_cumulative_unique_users,
    )

    got = q_cumulative_unique_users(SF)
    ev = papq.read_table(SF + "/events.parquet", columns=["user_id", "ts"])
    users = ev["user_id"].to_pandas()
    hours = ev["ts"].to_pandas().astype("int64") // 3_600_000_000
    want = (
        pd.DataFrame({"u": users, "h": hours})
        .groupby("u")["h"]
        .min()
        .value_counts()
        .sort_index()
    )
    assert (got["new_users"].to_numpy() == want.to_numpy()).all()
    assert (got["hour_bucket"].to_numpy() == want.index.to_numpy()).all()
    # running total is nondecreasing and ends at the global distinct count
    assert (np.diff(got["cum_users"].to_numpy()) >= 0).all()
    assert got["cum_users"].iloc[-1] == users.nunique()


def test_hopping_window_total_is_3x_events(ray_session):
    from pynomaly_ray.pipelines.queries_wave26 import (
        q_hopping_window_counts,
    )

    got = q_hopping_window_counts(SF)
    n_events = papq.read_metadata(SF + "/events.parquet").num_rows
    # every event is multi-assigned to exactly 3 windows
    assert got["n_events"].sum() == 3 * n_events
    # window (t, h) must equal the sum of hour-counts h, h+1, h+2
    ev = papq.read_table(SF + "/events.parquet", columns=["event_type", "ts"])
    hr = ev["ts"].to_pandas().astype("int64") // 3_600_000_000
    per_hour = (
        pd.DataFrame({"t": ev["event_type"].to_pandas(), "h": hr})
        .groupby(["t", "h"])
        .size()
    )
    sample = got.sample(n=min(50, len(got)), random_state=7)
    for _, row in sample.iterrows():
        want = sum(
            per_hour.get((row["event_type"], row["window_start"] + k), 0)
            for k in range(3)
        )
        assert row["n_events"] == want


def test_sssp_matches_driver_bellman_ford(ray_session):
    from pynomaly_ray.pipelines.queries_wave24 import _directed_edges
    from pynomaly_ray.pipelines.queries_wave26 import (
        _SSSP_ROUNDS,
        _SSSP_SEED_MOD,
        q_sssp_distances,
    )

    got = q_sssp_distances(SF)
    e = _directed_edges(SF).to_pandas()
    u = e["u"].to_numpy(np.int64)
    v = e["v"].to_numpy(np.int64)
    w = 1 + (u + v) % 7
    nodes = np.unique(np.concatenate([u, v]))
    INF = np.iinfo(np.int64).max // 4
    dist = {int(n): (0 if n % _SSSP_SEED_MOD == 0 else INF) for n in nodes}
    for _ in range(_SSSP_ROUNDS):
        nxt = dict(dist)
        for a, b, ww in zip(u, v, w):
            if dist[int(a)] + ww < nxt[int(b)]:
                nxt[int(b)] = dist[int(a)] + int(ww)
        dist = nxt
    want = (
        pd.DataFrame(
            [(n, d) for n, d in dist.items() if d < INF],
            columns=["node", "dist"],
        )
        .sort_values("node")
        .reset_index(drop=True)
    )
    got = got.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))
    # all sources present at distance 0
    seeds = nodes[nodes % _SSSP_SEED_MOD == 0]
    assert set(seeds) <= set(got.loc[got["dist"] == 0, "node"])


def test_page_orders_is_exact_slice_of_full_sort(ray_session):
    from pynomaly_ray.pipelines.queries_wave26 import (
        _PAGE_LIMIT,
        _PAGE_OFFSET,
        q_page_orders,
    )

    got = q_page_orders(SF)
    o = papq.read_table(
        SF + "/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    full = o.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).reset_index(drop=True)
    want = full.iloc[_PAGE_OFFSET : _PAGE_OFFSET + _PAGE_LIMIT].reset_index(
        drop=True
    )
    assert len(got) == _PAGE_LIMIT
    assert (got["rn"].to_numpy() == np.arange(101, 151)).all()
    assert (got["o_orderkey"].to_numpy() == want["o_orderkey"].to_numpy()).all()
    assert (
        got["o_totalprice"].to_numpy() == want["o_totalprice"].to_numpy()
    ).all()


def test_gopher_quality_matches_pandas_recompute(ray_session):
    from pynomaly_ray.pipelines.queries_wave26 import (
        _GQ_LEN_DEN,
        _GQ_LEN_NUM_HI,
        _GQ_LEN_NUM_LO,
        _GQ_MAX_WORDS,
        _GQ_MIN_WORDS,
        _GQ_STOPWORDS,
        q_gopher_quality_counts,
    )

    got = q_gopher_quality_counts(SF)
    d = papq.read_table(
        SF + "/documents.parquet", columns=["source", "text"]
    ).to_pandas()
    toks = d["text"].fillna("").str.findall(r"[^ \t\n\r\f\v]+")
    n_words = toks.str.len().astype(np.int64)
    wchars = toks.map(lambda ws: sum(len(x) for x in ws)).astype(np.int64)
    has_stop = toks.map(lambda ws: any(x in _GQ_STOPWORDS for x in ws))
    ok = (
        (n_words >= _GQ_MIN_WORDS)
        & (n_words <= _GQ_MAX_WORDS)
        & (_GQ_LEN_NUM_LO * n_words <= _GQ_LEN_DEN * wchars)
        & (_GQ_LEN_DEN * wchars <= _GQ_LEN_NUM_HI * n_words)
        & has_stop
    )
    want = (
        pd.DataFrame({"source": d["source"], "p": ok.astype(np.int64)})
        .groupby("source")
        .agg(n_docs=("p", "size"), n_pass=("p", "sum"))
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    got = got.sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["source", "n_docs", "n_pass"]],
        want,
        check_dtype=False,
    )
    # non-trivial on this corpus: some docs pass, some fail
    assert 0 < got["n_pass"].sum() < got["n_docs"].sum()


def test_sssp_block_layout_invariance(ray_session, monkeypatch):
    """Forcing a tiny bucket target multiplies the exchange fan-out for
    every per-round join/aggregate; the (min,+) reduction must be
    layout-invariant (same distances regardless of partitioning)."""
    from pynomaly_ray.pipelines.queries_wave26 import q_sssp_distances

    base = q_sssp_distances(SF).reset_index(drop=True)
    monkeypatch.setenv("PNR_BUCKET_TARGET_BYTES", "2048")
    forced = q_sssp_distances(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, forced)


def test_hopping_window_block_layout_invariance(ray_session, monkeypatch):
    from pynomaly_ray.pipelines.queries_wave26 import (
        q_hopping_window_counts,
    )

    base = q_hopping_window_counts(SF).reset_index(drop=True)
    monkeypatch.setenv("PNR_BUCKET_TARGET_BYTES", "2048")
    forced = q_hopping_window_counts(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, forced)
