"""Wave-27 tests: the Z-order clustered layout — rectangle exactness,
two-dimensional pruning, null semantics, and the commit-marker
crash-safety contract."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _mkds(df, parts=8):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


@pytest.fixture()
def zl(ray_session, tmp_path):
    from pynomaly_ray.sources.zorder_layout import write_zorder

    rng = np.random.default_rng(11)
    n = 50_000
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 10_000, n),
            "b": rng.integers(0, 10_000, n),
            "payload": rng.integers(0, 100, n),
        }
    )
    path = str(tmp_path / "zl")
    m = write_zorder(_mkds(df), ["a", "b"], path, num_partitions=16)
    return df, path, m


def test_zorder_rectangles_exact(ray_session, zl):
    from pynomaly_ray.sources.zorder_layout import zorder_scan

    df, path, _m = zl
    rng = np.random.default_rng(3)
    for _ in range(5):
        lo1, lo2 = rng.integers(0, 9_000, 2)
        r1, r2 = (int(lo1), int(lo1) + 1000), (int(lo2), int(lo2) + 1000)
        got = (
            zorder_scan(path, r1, r2)
            .to_pandas()
            .sort_values(["a", "b", "payload"])
            .reset_index(drop=True)
        )
        want = (
            df[
                (df.a >= r1[0])
                & (df.a <= r1[1])
                & (df.b >= r2[0])
                & (df.b <= r2[1])
            ]
            .sort_values(["a", "b", "payload"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        for c in ("a", "b", "payload"):
            assert (
                got[c].to_numpy(np.int64) == want[c].to_numpy(np.int64)
            ).all()


def test_zorder_prunes_both_dimensions(ray_session, zl):
    from pynomaly_ray.sources.zorder_layout import zorder_plan

    _df, path, m = zl
    total = len(m["zones"])
    assert total == 16
    # a small rectangle touches few files
    assert len(zorder_plan(path, (2000, 3000), (7000, 8000))) < total
    # EACH dimension alone prunes — the property a 1-D sort cannot give
    assert len(zorder_plan(path, (0, 1000), (None, None))) < total
    assert len(zorder_plan(path, (None, None), (0, 1000))) < total
    # unconstrained plan reads everything
    assert len(zorder_plan(path)) == total


def test_zorder_open_sides_and_columns(ray_session, zl):
    from pynomaly_ray.sources.zorder_layout import zorder_scan

    df, path, _m = zl
    got = zorder_scan(path, (9_000, None), (None, None), columns=["payload"])
    gdf = got.to_pandas()
    want = df[df.a >= 9_000]
    assert list(gdf.columns) == ["payload"]
    assert len(gdf) == len(want)
    assert gdf["payload"].sum() == want["payload"].sum()


def test_zorder_null_keys_never_returned_when_constrained(
    ray_session, tmp_path
):
    from pynomaly_ray.sources.zorder_layout import write_zorder, zorder_scan

    df = pd.DataFrame(
        {
            "a": pd.array([1, 2, None, 4, 5] * 200, dtype="Int64"),
            "b": pd.array([10, None, 30, 40, 50] * 200, dtype="Int64"),
            "v": np.arange(1000),
        }
    )
    path = str(tmp_path / "zn")
    write_zorder(_mkds(df, parts=4), ["a", "b"], path, num_partitions=4)
    got = zorder_scan(path, (1, 5), (10, 50)).to_pandas()
    # constrained scan: rows with a null in either key are excluded
    want = df[(df.a.notna()) & (df.b.notna())]
    assert len(got) == len(want)
    # unconstrained scan returns every row, nulls included
    assert len(zorder_scan(path).to_pandas()) == len(df)


def test_zorder_timestamp_key(ray_session, tmp_path):
    from pynomaly_ray.sources.zorder_layout import (
        write_zorder,
        zorder_plan,
        zorder_scan,
    )

    n = 20_000
    rng = np.random.default_rng(5)
    ts = pd.Timestamp("2020-01-01") + pd.to_timedelta(
        rng.integers(0, 365, n), unit="D"
    )
    df = pd.DataFrame({"k": rng.integers(0, 1000, n), "t": ts})
    path = str(tmp_path / "zt")
    write_zorder(_mkds(df), ["k", "t"], path, num_partitions=8)
    r2 = (pd.Timestamp("2020-06-01"), pd.Timestamp("2020-06-30"))
    got = zorder_scan(path, (None, None), r2).to_pandas()
    want = df[(df.t >= r2[0]) & (df.t <= r2[1])]
    assert len(got) == len(want)
    assert len(zorder_plan(path, (None, None), r2)) < 8


def test_zorder_uncommitted_layout_refuses(ray_session, tmp_path):
    from pynomaly_ray.sources.zorder_layout import (
        _MANIFEST,
        write_zorder,
        zorder_scan,
    )

    df = pd.DataFrame({"a": np.arange(100), "b": np.arange(100)})
    path = str(tmp_path / "zc")
    write_zorder(_mkds(df, parts=2), ["a", "b"], path, num_partitions=2)
    os.remove(os.path.join(path, _MANIFEST))  # simulate interrupted rewrite
    with pytest.raises(FileNotFoundError, match="commit marker"):
        zorder_scan(path, (0, 10), (0, 10))


def test_zorder_rewrite_overwrites_cleanly(ray_session, tmp_path):
    from pynomaly_ray.sources.zorder_layout import write_zorder, zorder_scan

    path = str(tmp_path / "zr")
    df1 = pd.DataFrame({"a": np.arange(1000), "b": np.arange(1000), "v": 1})
    write_zorder(_mkds(df1, parts=4), ["a", "b"], path, num_partitions=4)
    df2 = pd.DataFrame({"a": np.arange(500), "b": np.arange(500), "v": 2})
    write_zorder(_mkds(df2, parts=4), ["a", "b"], path, num_partitions=2)
    got = zorder_scan(path).to_pandas()
    assert len(got) == 500
    assert (got["v"] == 2).all()


def test_zorder_rejects_bad_inputs(ray_session, tmp_path):
    from pynomaly_ray.sources.zorder_layout import write_zorder

    df = pd.DataFrame({"a": [1], "b": ["x"]})
    with pytest.raises(TypeError, match="integer or timestamp"):
        write_zorder(
            _mkds(df, parts=1), ["a", "b"], str(tmp_path / "zx"), 1
        )
    with pytest.raises(ValueError, match="exactly two keys"):
        write_zorder(
            _mkds(pd.DataFrame({"a": [1]}), parts=1),
            ["a"],
            str(tmp_path / "zy"),
            1,
        )


def test_cli_layout_zorder_and_sorted(ray_session, tmp_path, capsys):
    import json

    from pynomaly_ray.cli import main
    from pynomaly_ray.sources.zorder_layout import zorder_plan, zorder_scan

    zout = str(tmp_path / "cli_z")
    rc = main(
        [
            "layout", "--input", SF + "/orders.parquet", "--out", zout,
            "--mode", "zorder", "--keys", "o_custkey,o_orderdate",
            "--partitions", "8",
        ]
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["files"] == 8 and rec["rows"] > 0
    # the CLI-written layout serves pruned scans
    assert len(zorder_plan(zout, (0, 50), (None, None))) < 8
    assert zorder_scan(zout).to_pandas().shape[0] == rec["rows"]

    sout = str(tmp_path / "cli_s")
    rc = main(
        [
            "layout", "--input", SF + "/orders.parquet", "--out", sout,
            "--mode", "sorted", "--keys", "o_orderdate",
            "--partitions", "4",
        ]
    )
    assert rc == 0
    # bad input: two keys to sorted mode
    rc = main(
        [
            "layout", "--input", SF + "/orders.parquet",
            "--out", str(tmp_path / "cli_bad"), "--mode", "sorted",
            "--keys", "a,b",
        ]
    )
    assert rc == 2


def test_zorder_append_exact_and_pruned(ray_session, tmp_path):
    from pynomaly_ray.sources.zorder_layout import (
        append_zorder,
        load_manifest,
        write_zorder,
        zorder_plan,
        zorder_scan,
    )

    rng = np.random.default_rng(13)
    base = pd.DataFrame(
        {
            "a": rng.integers(0, 10_000, 30_000),
            "b": rng.integers(0, 10_000, 30_000),
            "v": 0,
        }
    )
    delta = pd.DataFrame(
        {
            "a": rng.integers(0, 10_000, 10_000),
            "b": rng.integers(0, 10_000, 10_000),
            "v": 1,
        }
    )
    path = str(tmp_path / "za")
    write_zorder(_mkds(base), ["a", "b"], path, num_partitions=8)
    m = append_zorder(_mkds(delta, parts=4), path, num_partitions=4)
    assert m["rows"] == 40_000 and m["gen"] == 1
    total = len(load_manifest(path)["zones"])
    assert total == 12
    # rectangle scans stay exact across generations
    r1, r2 = (2000, 3000), (2000, 3000)
    got = zorder_scan(path, r1, r2).to_pandas()
    both = pd.concat([base, delta], ignore_index=True)
    want = both[
        (both.a >= r1[0]) & (both.a <= r1[1])
        & (both.b >= r2[0]) & (both.b <= r2[1])
    ]
    assert len(got) == len(want)
    assert got["v"].sum() == want["v"].sum()  # rows from BOTH generations
    # pruning still effective (delta was z-coded with the same splitters)
    assert len(zorder_plan(path, r1, r2)) < total


def test_matview_retraction(ray_session, tmp_path):
    from pynomaly_ray.state.matview import (
        create_matview,
        read_matview,
        refresh_matview,
        retract_matview,
    )

    spec = {"n": (None, "count"), "s": ("v", "sum")}
    path = str(tmp_path / "mvr")
    base = pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 2, 10]})
    d1 = pd.DataFrame({"k": ["b", "c"], "v": [5, 7]})
    create_matview(path, _mkds(base, parts=1), ["k"], spec)
    refresh_matview(path, _mkds(d1, parts=1), "r1")
    # retract d1: state must equal the base-only aggregate, and key c
    # (whose last row is gone) must vanish from the view
    m = retract_matview(path, _mkds(d1, parts=1), "x1")
    got = (
        read_matview(path).to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert list(got["k"]) == ["a", "b"]
    assert list(got["n"].astype(int)) == [2, 1]
    assert list(got["s"].astype(int)) == [3, 10]
    # exactly-once: re-delivered retraction is a no-op
    m2 = retract_matview(path, _mkds(d1, parts=1), "x1")
    assert m2["gen"] == m["gen"]
    # over-retraction (rows never folded in) aborts before commit
    with pytest.raises(Exception, match="negative"):
        retract_matview(
            path,
            _mkds(pd.DataFrame({"k": ["zz"], "v": [1]}), parts=1),
            "x2",
        )
    # the failed retraction left the committed state serving
    again = (
        read_matview(path).to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)


def test_matview_retraction_rejects_min_max(ray_session, tmp_path):
    from pynomaly_ray.state.matview import create_matview, retract_matview

    path = str(tmp_path / "mvx")
    df = pd.DataFrame({"k": ["a"], "v": [1]})
    create_matview(
        path,
        _mkds(df, parts=1),
        ["k"],
        {"n": (None, "count"), "mn": ("v", "min")},
    )
    with pytest.raises(ValueError, match="sign-invertible"):
        retract_matview(path, _mkds(df, parts=1), "x1")


def test_zorder_degenerate_rectangles(ray_session, zl):
    from pynomaly_ray.sources.zorder_layout import zorder_plan, zorder_scan

    df, path, _m = zl
    # single-point rectangle
    a0, b0 = int(df.iloc[0]["a"]), int(df.iloc[0]["b"])
    got = zorder_scan(path, (a0, a0), (b0, b0)).to_pandas()
    want = df[(df.a == a0) & (df.b == b0)]
    assert len(got) == len(want) >= 1
    # rectangle fully outside the domain: the plan is empty and the
    # scan returns a TYPED empty dataset (schema survives zero files)
    assert zorder_plan(path, (1_000_000, 2_000_000), (None, None)) == []
    empty = zorder_scan(path, (1_000_000, 2_000_000), (None, None))
    edf = empty.to_pandas()
    assert len(edf) == 0
    assert set(["a", "b", "payload"]) <= set(empty.schema().names)
    # empty plan with column projection keeps the projected schema
    ep = zorder_scan(
        path, (1_000_000, 2_000_000), (None, None), columns=["payload"]
    )
    assert ep.schema().names == ["payload"] and len(ep.to_pandas()) == 0
    # in-domain rectangle with no matching rows still returns exact zero
    got2 = zorder_scan(path, (0, 0), (9_999, 9_999)).to_pandas()
    want2 = df[(df.a == 0) & (df.b == 9_999)]
    assert len(got2) == len(want2)
