"""Wave-28 tests: materialized-view maintenance — incremental identity,
exactly-once refresh, crash contract, and spec validation."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest


def _mkds(df, parts=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


def _frames(rng, n, keys=("a", "b", "c")):
    return pd.DataFrame(
        {
            "k": rng.choice(list(keys), n),
            "v": rng.integers(-100, 100, n),
        }
    )


SPEC = {
    "n": (None, "count"),
    "s": ("v", "sum"),
    "mn": ("v", "min"),
    "mx": ("v", "max"),
}


def _expected(df):
    return (
        df.groupby("k")
        .agg(n=("v", "size"), s=("v", "sum"), mn=("v", "min"), mx=("v", "max"))
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )


def _state(path):
    from pynomaly_ray.state.matview import read_matview

    return (
        read_matview(path)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)[["k", "n", "s", "mn", "mx"]]
        .astype({"n": np.int64, "s": np.int64, "mn": np.int64, "mx": np.int64})
    )


def test_matview_incremental_equals_full_recompute(ray_session, tmp_path):
    from pynomaly_ray.state.matview import create_matview, refresh_matview

    rng = np.random.default_rng(1)
    base = _frames(rng, 5000)
    d1 = _frames(rng, 3000)
    d2 = _frames(rng, 2000, keys=("c", "d", "e"))  # new keys appear
    path = str(tmp_path / "mv")
    create_matview(path, _mkds(base), ["k"], SPEC)
    refresh_matview(path, _mkds(d1), "r1")
    refresh_matview(path, _mkds(d2), "r2")
    want = _expected(pd.concat([base, d1, d2], ignore_index=True))
    got = _state(path)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_matview_retry_is_exactly_once(ray_session, tmp_path):
    from pynomaly_ray.state.matview import create_matview, refresh_matview

    rng = np.random.default_rng(2)
    base, d1 = _frames(rng, 1000), _frames(rng, 500)
    path = str(tmp_path / "mv")
    create_matview(path, _mkds(base), ["k"], SPEC)
    m1 = refresh_matview(path, _mkds(d1), "r1")
    before = _state(path)
    # re-delivered increment (crash between sink and ack upstream)
    m2 = refresh_matview(path, _mkds(d1), "r1")
    assert m2["gen"] == m1["gen"]
    assert m2["applied_run_ids"] == m1["applied_run_ids"]
    pd.testing.assert_frame_equal(_state(path), before)


def test_matview_uncommitted_refuses_and_old_gen_survives_crash(
    ray_session, tmp_path
):
    from pynomaly_ray.state.matview import (
        _MANIFEST,
        create_matview,
        load_manifest,
        read_matview,
        refresh_matview,
    )

    rng = np.random.default_rng(3)
    base = _frames(rng, 1000)
    path = str(tmp_path / "mv")
    create_matview(path, _mkds(base), ["k"], SPEC)
    # a crash BEFORE the manifest swap leaves gen-0 serving: simulate a
    # half-written next generation
    os.makedirs(os.path.join(path, "gen-000001"), exist_ok=True)
    assert load_manifest(path)["gen"] == 0
    assert len(read_matview(path).to_pandas()) == base["k"].nunique()
    # the retried refresh overwrites the orphan generation and commits
    refresh_matview(path, _mkds(_frames(rng, 200)), "r1")
    assert load_manifest(path)["gen"] == 1
    # no marker at all -> refuse
    os.remove(os.path.join(path, _MANIFEST))
    with pytest.raises(FileNotFoundError, match="commit marker"):
        read_matview(path)


def test_matview_rejects_non_mergeable_aggregates(ray_session, tmp_path):
    from pynomaly_ray.state.matview import create_matview

    df = pd.DataFrame({"k": ["a"], "v": [1]})
    with pytest.raises(ValueError, match="not mergeable"):
        create_matview(
            str(tmp_path / "mv"),
            _mkds(df, parts=1),
            ["k"],
            {"m": ("v", "median")},
        )


def test_matview_min_max_move_correctly(ray_session, tmp_path):
    from pynomaly_ray.state.matview import create_matview, refresh_matview

    path = str(tmp_path / "mv")
    base = pd.DataFrame({"k": ["a", "a"], "v": [5, 7]})
    create_matview(path, _mkds(base, parts=1), ["k"], SPEC)
    # a delta that extends BOTH extremes of an existing key
    refresh_matview(
        path, _mkds(pd.DataFrame({"k": ["a"], "v": [-50]}), parts=1), "r1"
    )
    refresh_matview(
        path, _mkds(pd.DataFrame({"k": ["a"], "v": [99]}), parts=1), "r2"
    )
    got = _state(path)
    assert got.loc[0, "mn"] == -50 and got.loc[0, "mx"] == 99
    assert got.loc[0, "n"] == 4 and got.loc[0, "s"] == 61


def test_vocab_build_and_oov_match_pandas(ray_session):
    import pyarrow.parquet as papq

    from pynomaly_ray.pipelines.queries_wave30 import (
        _OOV_K,
        q_oov_rates,
        q_vocab_build,
    )

    SF = "/root/testdata/sf0.001"
    got = q_vocab_build(SF)
    d = papq.read_table(SF + "/documents.parquet", columns=["source", "text"])
    toks = d["text"].to_pandas().fillna("").str.findall(r"[^ \t\n\r\f\v]+")
    flat = toks.explode().dropna()
    counts = flat.value_counts()
    want = (
        counts.rename_axis("token")
        .reset_index(name="cnt")
        .sort_values(["cnt", "token"], ascending=[False, True])
        .head(1000)
        .reset_index(drop=True)
    )
    assert (got["token"].to_numpy() == want["token"].to_numpy()).all()
    assert (got["cnt"].to_numpy() == want["cnt"].to_numpy()).all()
    # ids are dense 1..n ranks
    assert (got["token_id"].to_numpy() == np.arange(1, len(got) + 1)).all()

    oov = q_oov_rates(SF)
    vocab = set(want.head(_OOV_K)["token"])
    src = pd.Series(
        np.repeat(
            d["source"].to_pandas().to_numpy(),
            toks.str.len().to_numpy(dtype=np.int64),
        )
    )
    is_oov = (~flat.isin(vocab)).to_numpy(np.int64)
    wantd = (
        pd.DataFrame({"source": src.to_numpy(), "oov": is_oov})
        .groupby("source")
        .agg(n_tokens=("oov", "size"), n_oov=("oov", "sum"))
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    oov = oov.sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        oov, wantd.astype(oov.dtypes.to_dict())
    )
    assert (oov["n_oov"] <= oov["n_tokens"]).all()
    assert oov["n_oov"].sum() > 0  # the cutoff actually bites


def test_token_diversity_batch_and_layout_invariant(
    ray_session, monkeypatch
):
    """Σcnt² must square GLOBAL per-(source,token) counts — a fold that
    squared per-batch partials would understate collision mass, so the
    result must be invariant to batch and bucket layout."""
    from pynomaly_ray.pipelines.queries_wave31 import q_token_diversity

    SF = "/root/testdata/sf0.001"
    base = q_token_diversity(SF).reset_index(drop=True)
    monkeypatch.setenv("PNR_BUCKET_TARGET_BYTES", "2048")
    forced = q_token_diversity(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, forced)
    # collision mass >= n_tokens (every type contributes cnt² >= cnt),
    # with equality iff every token is unique
    assert (base["collision_mass"] >= base["n_tokens"]).all()
    assert (base["n_types"] <= base["n_tokens"]).all()


def test_cli_matview_lifecycle(ray_session, tmp_path, capsys):
    import json

    import pyarrow.parquet as papq

    from pynomaly_ray.cli import main

    SF = "/root/testdata/sf0.001"
    view = str(tmp_path / "mv")

    def run(argv):
        rc = main(argv)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return rc, json.loads(out)

    rc, rec = run(
        [
            "matview", "create", "--view", view,
            "--input", SF + "/documents.parquet",
            "--keys", "source",
            "--agg", "n_docs=count,sum_chars=sum:n_chars",
        ]
    )
    assert rc == 0 and rec["gen"] == 0
    rc, rec = run(
        [
            "matview", "refresh", "--view", view,
            "--input", SF + "/documents.parquet", "--run-id", "r1",
        ]
    )
    assert rc == 0 and rec["gen"] == 1
    # retract the same increment -> state equals the base aggregate
    rc, rec = run(
        [
            "matview", "retract", "--view", view,
            "--input", SF + "/documents.parquet", "--run-id", "x1",
        ]
    )
    assert rc == 0 and rec["gen"] == 2
    dump = str(tmp_path / "state.parquet")
    rc, rec = run(["matview", "read", "--view", view, "--out", dump])
    assert rc == 0 and rec["applied_run_ids"] == ["base", "r1", "x1"]
    got = (
        papq.read_table(dump)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    d = papq.read_table(
        SF + "/documents.parquet", columns=["source", "n_chars"]
    ).to_pandas()
    want = (
        d.groupby("source")
        .agg(n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert (got["n_docs"].to_numpy(np.int64) == want["n_docs"].to_numpy()).all()
    assert (
        got["sum_chars"].to_numpy(np.int64) == want["sum_chars"].to_numpy()
    ).all()
    # bad spec surfaces as rc=2, not a traceback
    rc, rec = run(
        [
            "matview", "create", "--view", str(tmp_path / "mv2"),
            "--input", SF + "/documents.parquet",
            "--keys", "source", "--agg", "m=median:n_chars",
        ]
    )
    assert rc == 2 and "error" in rec


def test_matview_hll_distinct_maintenance(ray_session, tmp_path):
    """An hll view column maintains approximate COUNT(DISTINCT) across
    increments: after three refreshes the estimate must track the exact
    distinct count of the union (registers max-merge, so re-ingesting
    the SAME values must not move the estimate at all)."""
    from pynomaly_ray.state.matview import (
        create_matview,
        hll_estimates,
        read_matview,
        refresh_matview,
        retract_matview,
    )

    rng = np.random.default_rng(17)

    def chunk(lo, hi, n):
        return pd.DataFrame(
            {
                "k": rng.choice(["x", "y"], n),
                "u": rng.integers(lo, hi, n).astype(str),
            }
        )

    base = chunk(0, 5000, 8000)
    d1 = chunk(2500, 7500, 8000)
    d2 = chunk(5000, 10000, 8000)
    spec = {"n": (None, "count"), "du": ("u", "hll")}
    path = str(tmp_path / "mvh")
    create_matview(path, _mkds(base), ["k"], spec)
    refresh_matview(path, _mkds(d1), "r1")
    refresh_matview(path, _mkds(d2), "r2")
    got = read_matview(path).to_pandas().sort_values("k").reset_index(drop=True)
    est = hll_estimates(got, "du")
    allrows = pd.concat([base, d1, d2], ignore_index=True)
    exact = allrows.groupby("k")["u"].nunique().sort_index().to_numpy()
    assert np.all(np.abs(est - exact) / exact < 0.05)
    # idempotence: re-ingesting already-seen values cannot move registers
    refresh_matview(path, _mkds(d2), "r3")
    got2 = (
        read_matview(path).to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert (hll_estimates(got2, "du") == est).all()
    # hll is not sign-invertible: retraction refuses up front
    with pytest.raises(ValueError, match="sign-invertible"):
        retract_matview(path, _mkds(d2), "x1")


def test_matview_kll_quantile_maintenance(ray_session, tmp_path):
    """A kll view column maintains per-key quantiles across increments:
    after two refreshes the p50/p90 must be within KLL rank error of
    the exact quantiles of the union."""
    from pynomaly_ray.state.matview import (
        create_matview,
        kll_quantiles,
        read_matview,
        refresh_matview,
        retract_matview,
    )

    rng = np.random.default_rng(23)

    def chunk(scale, n):
        return pd.DataFrame(
            {
                "k": rng.choice(["x", "y"], n),
                "v": rng.normal(scale, 10.0, n),
            }
        )

    base, d1, d2 = chunk(0, 6000), chunk(50, 6000), chunk(100, 6000)
    spec = {"n": (None, "count"), "qv": ("v", "kll")}
    path = str(tmp_path / "mvk")
    create_matview(path, _mkds(base), ["k"], spec)
    refresh_matview(path, _mkds(d1), "r1")
    refresh_matview(path, _mkds(d2), "r2")
    got = read_matview(path).to_pandas().sort_values("k").reset_index(drop=True)
    allrows = pd.concat([base, d1, d2], ignore_index=True)
    for q in (0.5, 0.9):
        est = kll_quantiles(got, "qv", q)
        for i, key in enumerate(got["k"]):
            vals = np.sort(allrows.loc[allrows.k == key, "v"].to_numpy())
            # rank error bound: the estimate's true rank must be within
            # a few percent of q*n (KLL O(1/k) envelope, k=256)
            rank = np.searchsorted(vals, est[i]) / len(vals)
            assert abs(rank - q) < 0.05, (key, q, rank)
    # kll is not sign-invertible either
    with pytest.raises(ValueError, match="sign-invertible"):
        retract_matview(path, _mkds(d1), "x1")


def test_curated_source_stats_layout_invariant(ray_session, monkeypatch):
    """The composed curation chain (filter -> keep-first dedup ->
    aggregate) must be invariant to exchange fan-out: the keep-first
    winner is decided on exact text inside whatever bucket its hash
    lands in."""
    from pynomaly_ray.pipelines.queries_wave35 import q_curated_source_stats

    SF = "/root/testdata/sf0.001"
    base = q_curated_source_stats(SF).reset_index(drop=True)
    monkeypatch.setenv("PNR_BUCKET_TARGET_BYTES", "2048")
    forced = q_curated_source_stats(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, forced)
    # the filter and the dedup both bite on this corpus
    import pyarrow.parquet as papq

    total = papq.read_metadata(SF + "/documents.parquet").num_rows
    assert 0 < base["n_docs"].sum() < total
