"""Wave-36 tests: storage-partitioned sort-merge join and the
automatic skew join (hot-key detection, salting, replication)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest


def _mkds(df, parts=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


# ---------------------------------------------------------------------------
# sorted_merge_join
# ---------------------------------------------------------------------------
def _spj_frames(rng, n_left=5000, n_right=800):
    # boundary-straddling equal keys on purpose: small key domain so
    # equal keys land on both sides of file splits
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 300, n_left),
            "lv": rng.integers(-100, 100, n_left),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 300, n_right),
            "rv": rng.integers(0, 10, n_right),
        }
    )
    return left, right


def test_sorted_merge_join_matches_pandas(ray_session, tmp_path):
    from pynomaly_ray.sources.sorted_layout import (
        merge_join_plan,
        sorted_merge_join,
        write_sorted,
    )

    rng = np.random.default_rng(7)
    left, right = _spj_frames(rng)
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    write_sorted(_mkds(left, 6), "k", lp, num_partitions=6)
    write_sorted(_mkds(right, 4), "rk", rp, num_partitions=4)

    got = (
        sorted_merge_join(lp, rp)
        .to_pandas()
        .sort_values(["k", "lv", "rv"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, left_on="k", right_on="rk", how="inner")
        .sort_values(["k", "lv", "rv"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "lv", "rk", "rv"]], exp[["k", "lv", "rk", "rv"]]
    )

    # co-sorted alignment: never the all-pairs cross product
    plan = merge_join_plan(lp, rp)
    assert len(plan) == 6
    assert sum(len(p["rfiles"]) for p in plan) < 6 * 4


def test_sorted_merge_join_null_keys_and_merge_fn(ray_session, tmp_path):
    from pynomaly_ray.sources.sorted_layout import (
        sorted_merge_join,
        write_sorted,
    )

    left = pd.DataFrame(
        {"k": pd.array([1, 1, None, 2, 3], dtype="Int64"), "lv": range(5)}
    )
    right = pd.DataFrame(
        {"rk": pd.array([1, None, 3, 4], dtype="Int64"), "rv": range(4)}
    )
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    write_sorted(_mkds(left, 2), "k", lp, num_partitions=2)
    write_sorted(_mkds(right, 2), "rk", rp, num_partitions=2)

    got = sorted_merge_join(
        lp,
        rp,
        merge_fn=lambda df: df.groupby("k", sort=False)
        .agg(n=("rv", "size"))
        .reset_index(),
    ).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    # NULL keys never match (inner semantics); 1 matches twice-left,
    # 3 matches once
    assert got["k"].tolist() == [1, 3]
    assert got["n"].tolist() == [2, 1]


def test_sorted_merge_join_across_appended_generation(ray_session, tmp_path):
    """Appends leave overlapping left zones; every pair still appears
    exactly once."""
    from pynomaly_ray.sources.sorted_layout import (
        append_sorted,
        sorted_merge_join,
        write_sorted,
    )

    rng = np.random.default_rng(11)
    left, right = _spj_frames(rng, n_left=2000, n_right=500)
    base, delta = left.iloc[:1200], left.iloc[1200:]
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    write_sorted(_mkds(base, 3), "k", lp, num_partitions=3)
    append_sorted(_mkds(delta, 2), lp, num_partitions=2)
    write_sorted(_mkds(right, 3), "rk", rp, num_partitions=3)

    got = sorted_merge_join(lp, rp).to_pandas()
    exp = left.merge(right, left_on="k", right_on="rk", how="inner")
    assert len(got) == len(exp)
    assert got["lv"].sum() == exp["lv"].sum()
    assert (got["k"].to_numpy(np.int64) * got["rv"].to_numpy(np.int64)).sum() == (
        exp["k"].to_numpy(np.int64) * exp["rv"].to_numpy(np.int64)
    ).sum()


def test_sorted_merge_join_kind_mismatch_refuses(ray_session, tmp_path):
    from pynomaly_ray.sources.sorted_layout import (
        merge_join_plan,
        write_sorted,
    )

    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    write_sorted(
        _mkds(pd.DataFrame({"k": [1, 2], "v": [0, 1]}), 1), "k", lp
    )
    write_sorted(
        _mkds(pd.DataFrame({"k": ["a", "b"], "v": [0, 1]}), 1), "k", rp
    )
    with pytest.raises(TypeError, match="kinds differ"):
        merge_join_plan(lp, rp)


# ---------------------------------------------------------------------------
# skew_join / detect_hot_keys
# ---------------------------------------------------------------------------
def _skewed_frames(rng, n=20000):
    # one 50%-hot key, the rest uniform
    keys = np.where(
        rng.random(n) < 0.5, 7, rng.integers(100, 400, n)
    ).astype(np.int64)
    left = pd.DataFrame({"k": keys, "lv": rng.integers(0, 100, n)})
    right = pd.DataFrame(
        {"k": np.arange(0, 450, dtype=np.int64)}
    )
    right["w"] = right["k"] * 2 + 1
    return left, right


def test_detect_hot_keys_finds_planted_hot_key(ray_session):
    from pynomaly_ray.functions.exchange import detect_hot_keys

    rng = np.random.default_rng(3)
    left, _ = _skewed_frames(rng)
    hot = detect_hot_keys(_mkds(left, 8), "k", threshold=5000)
    assert hot.to_pylist() == [7]
    # nothing reaches an absurd threshold
    none = detect_hot_keys(_mkds(left, 8), "k", threshold=10**9)
    assert len(none) == 0


def test_skew_join_matches_pandas_both_paths(ray_session):
    from pynomaly_ray.functions.exchange import skew_join

    rng = np.random.default_rng(5)
    left, right = _skewed_frames(rng)
    exp = (
        left.merge(right, on="k", how="inner")
        .sort_values(["k", "lv"], kind="mergesort")
        .reset_index(drop=True)
    )

    # hot path (threshold low enough to trip on the planted key)
    got_hot = (
        skew_join(_mkds(left, 8), _mkds(right, 2), "k", hot_threshold=5000)
        .to_pandas()
        .sort_values(["k", "lv"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_hot[exp.columns], exp)
    assert "_salt" not in got_hot.columns

    # cold path (nothing hot) is plain hash_join
    got_cold = (
        skew_join(
            _mkds(left, 8), _mkds(right, 2), "k", hot_threshold=10**9
        )
        .to_pandas()
        .sort_values(["k", "lv"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_cold[exp.columns], exp)


def test_skew_join_forced_hot_keys_and_merge_fn(ray_session):
    import pyarrow as pa

    from pynomaly_ray.functions.exchange import skew_join

    rng = np.random.default_rng(9)
    left, right = _skewed_frames(rng, n=5000)

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        assert "_salt" not in df.columns  # stripped before merge_fn
        return (
            df.groupby("k", sort=False)
            .agg(n=("lv", "size"), wsum=("w", "sum"))
            .reset_index()
        )

    from pynomaly_ray.functions.exchange import hash_aggregate

    joined = skew_join(
        _mkds(left, 6),
        _mkds(right, 2),
        "k",
        merge_fn=agg,
        hot_keys=pa.array([7], pa.int64()),
        num_salts=4,
    )
    out = hash_aggregate(
        joined,
        ["k"],
        lambda df: df.groupby("k", sort=False).sum().reset_index(),
    ).to_pandas()
    exp = (
        left.merge(right, on="k")
        .groupby("k")
        .agg(n=("lv", "size"), wsum=("w", "sum"))
        .reset_index()
    )
    out = out.sort_values("k").reset_index(drop=True)
    exp = exp.sort_values("k").reset_index(drop=True)
    assert out["n"].astype(np.int64).tolist() == exp["n"].tolist()
    assert out["wsum"].astype(np.int64).tolist() == exp["wsum"].tolist()


def test_skew_join_null_keys_follow_hash_join(ray_session):
    """skew_join's contract is hash_join parity — which is pd.merge
    semantics, where NA keys DO match each other (unlike SQL)."""
    from pynomaly_ray.functions.exchange import skew_join

    left = pd.DataFrame(
        {"k": pd.array([1, None, 2, 1], dtype="Int64"), "lv": range(4)}
    )
    right = pd.DataFrame(
        {"k": pd.array([1, 2, None], dtype="Int64"), "w": range(3)}
    )
    got = skew_join(
        _mkds(left, 2),
        _mkds(right, 1),
        "k",
        hot_keys=__import__("pyarrow").array([1], "int64"),
        num_salts=3,
    ).to_pandas()
    exp = left.merge(right, on="k", how="inner")
    assert len(got) == len(exp) == 4
    assert (
        sorted(got["k"].fillna(-1).astype(np.int64).tolist())
        == sorted(exp["k"].fillna(-1).astype(np.int64).tolist())
    )


# ---------------------------------------------------------------------------
# embedding quantization (wave 37)
# ---------------------------------------------------------------------------
def test_quantize_codes_contract():
    from pynomaly_ray.pipelines.queries_wave37 import quantize_codes

    rng = np.random.default_rng(13)
    e6 = rng.integers(-2_000_000, 2_000_000, size=(200, 8)).astype(np.int64)
    mn, mx = e6.min(axis=0), e6.max(axis=0)
    q = quantize_codes(e6, mn, mx)
    # codes live in [0, 255]
    assert q.min() >= 0 and q.max() <= 255
    # monotone within each dimension: larger value -> >= code
    for d in range(8):
        order = np.argsort(e6[:, d], kind="stable")
        assert (np.diff(q[order, d]) >= 0).all()
    # dequantization error bounded by one grid cell: code c covers
    # v in [mn + c*span/255, mn + (c+1)*span/255), span = mx - mn + 1
    span = (mx - mn + 1).astype(np.float64)
    deq = mn + (q + 0.5) * span / 255.0
    assert (np.abs(deq - e6) <= span / 510.0 + 1).all()
    # degenerate dimension codes to 0
    e6c = e6.copy()
    e6c[:, 3] = 42
    qc = quantize_codes(e6c, e6c.min(axis=0), e6c.max(axis=0))
    assert (qc[:, 3] == 0).all()


def test_quantize_matches_duckdb_floor_division():
    """The engine's numpy // and DuckDB's // agree on the non-negative
    numerator the quantizer produces."""
    import duckdb

    from pynomaly_ray.pipelines.queries_wave37 import quantize_codes

    e6 = np.array([[-5, 0, 7, 1_000_000]], np.int64).T.reshape(4, 1)
    mn = np.array([-5], np.int64)
    mx = np.array([1_000_000], np.int64)
    q = quantize_codes(e6, mn, mx).ravel()
    con = duckdb.connect()
    sql = con.execute(
        "SELECT ((v - (-5)) * 255) // (1000000 - (-5) + 1) "
        "FROM (VALUES (-5), (0), (7), (1000000)) t(v)"
    ).fetchall()
    assert q.tolist() == [r[0] for r in sql]


def test_knn_sq8_matches_bruteforce_on_crafted_corpus(ray_session, tmp_path):
    """knn_sq8 on a crafted embeddings.parquet equals an independent
    numpy recompute of bounds -> codes -> integer dots -> top-k."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from pynomaly_ray.pipelines.queries_wave38 import _N_QUERIES, _TOP_K, q_knn_sq8

    rng = np.random.default_rng(21)
    n, d = 60, 64
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [v for v in vecs.tolist()], pa.list_(pa.float32())
            ),
        }
    )
    papq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = q_knn_sq8(str(tmp_path))

    # independent recompute
    e6 = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    mn, mx = e6.min(axis=0), e6.max(axis=0)
    codes = (e6 - mn) * 255 // (mx - mn + 1)
    dots = codes @ codes[:_N_QUERIES].T
    rows = []
    for j in range(_N_QUERIES):
        sel = np.lexsort((np.arange(n), -dots[:, j]))[:_TOP_K]
        for c in sel:
            rows.append((j, int(c), int(dots[c, j])))
    exp = pd.DataFrame(rows, columns=["query_id", "cand_id", "dot"])
    pd.testing.assert_frame_equal(got, exp)
