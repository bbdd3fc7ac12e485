"""Wave-39 tests: storage-partitioned ASOF join over sorted layouts."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest


def _mkds(df, parts=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


def _layouts(tmp_path, left, right, lparts=6, rparts=5):
    from pynomaly_ray.sources.sorted_layout import write_sorted

    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    write_sorted(_mkds(left), "t", lp, num_partitions=lparts)
    write_sorted(_mkds(right), "rt", rp, num_partitions=rparts)
    return lp, rp


def _expected(left, right, direction):
    ls = left.sort_values("t", kind="mergesort")
    rs = right[right["rt"].notna()].sort_values("rt", kind="mergesort")
    exp = pd.merge_asof(
        ls[ls["t"].notna()],
        rs[["rt"]],
        left_on="t",
        right_on="rt",
        direction=direction,
    )
    return (
        exp[exp["rt"].notna()]
        .sort_values("ev")
        .reset_index(drop=True)[["t", "ev", "rt"]]
        .astype({"rt": "int64"})
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_sorted_asof_join_matches_pandas(ray_session, tmp_path, direction):
    from pynomaly_ray.sources.sorted_layout import sorted_asof_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {"t": rng.integers(0, 10_000, 3000), "ev": np.arange(3000)}
    )
    right = pd.DataFrame(
        {"rt": rng.integers(-500, 9_500, 700), "px": rng.normal(size=700)}
    )
    # equal right keys straddling file boundaries on purpose
    right.loc[:60, "rt"] = 2_500
    lp, rp = _layouts(tmp_path, left, right)

    got = (
        sorted_asof_join(lp, rp, direction=direction)
        .to_pandas()
        .sort_values("ev")
        .reset_index(drop=True)
    )
    # tie-invariant columns only: which px wins among equal rt is
    # engine-defined (documented caution), the matched rt is not
    pd.testing.assert_frame_equal(
        got[["t", "ev", "rt"]].astype({"rt": "int64"}),
        _expected(left, right, direction),
    )


def test_sorted_asof_plan_is_bounded(ray_session, tmp_path):
    """The predecessor-file trick: no task reads the whole right
    history — only overlap plus the boundary file(s)."""
    from pynomaly_ray.sources.sorted_layout import asof_join_plan

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {"t": rng.integers(0, 100_000, 5000), "ev": np.arange(5000)}
    )
    right = pd.DataFrame(
        {"rt": rng.integers(0, 100_000, 5000), "px": np.zeros(5000)}
    )
    lp, rp = _layouts(tmp_path, left, right, lparts=10, rparts=10)
    plan = asof_join_plan(lp, rp, "backward")
    assert len(plan) == 10
    total = sum(len(p["rfiles"]) for p in plan)
    # uniform co-sorted keys: ~1 overlap + <=1 predecessor per task,
    # 3x slack for boundary straddles; all-pairs would be 100
    assert total <= 3 * len(plan)
    # the last task must NOT read every right file
    assert len(plan[-1]["rfiles"]) < 10


def test_sorted_asof_null_keys_never_match(ray_session, tmp_path):
    from pynomaly_ray.sources.sorted_layout import sorted_asof_join

    left = pd.DataFrame(
        {"t": pd.array([1, None, 5, 9], dtype="Int64"), "ev": range(4)}
    )
    right = pd.DataFrame(
        {"rt": pd.array([None, 2, 4], dtype="Int64"), "px": [0.0, 1.0, 2.0]}
    )
    lp, rp = _layouts(tmp_path, left, right, lparts=2, rparts=2)
    got = (
        sorted_asof_join(lp, rp)
        .to_pandas()
        .sort_values("ev")
        .reset_index(drop=True)
    )
    # ev=0 (t=1): no rt<=1 exists (NULL never matches); ev=1: NULL left
    # key dropped; ev=2 matches rt=4? no -> rt<=5 is 4; ev=3 -> 4
    assert list(got["ev"]) == [2, 3]
    assert list(got["rt"]) == [4, 4]


def test_sorted_asof_no_match_is_typed_empty(ray_session, tmp_path):
    from pynomaly_ray.sources.sorted_layout import sorted_asof_join

    left = pd.DataFrame({"t": [1, 2, 3], "ev": [0, 1, 2]})
    right = pd.DataFrame({"rt": [100, 200], "px": [1.0, 2.0]})
    lp, rp = _layouts(tmp_path, left, right, lparts=2, rparts=1)
    got = sorted_asof_join(lp, rp, direction="backward")
    assert got.count() == 0
    # blocks stay TYPED even with zero rows (Dataset.to_pandas drops
    # columns on an all-empty dataset, so assert at the block level)
    assert set(got.schema().names) == {"t", "ev", "rt", "px"}


def test_sorted_asof_across_appended_generation(ray_session, tmp_path):
    """Appended layouts have overlapping zones; the plan's 'all files
    whose hi equals the below-max' rule must stay exact."""
    from pynomaly_ray.sources.sorted_layout import (
        append_sorted,
        sorted_asof_join,
        write_sorted,
    )

    rng = np.random.default_rng(29)
    left = pd.DataFrame(
        {"t": rng.integers(0, 5_000, 2000), "ev": np.arange(2000)}
    )
    r1 = pd.DataFrame(
        {"rt": rng.integers(0, 5_000, 400), "px": rng.normal(size=400)}
    )
    r2 = pd.DataFrame(
        {"rt": rng.integers(0, 5_000, 400), "px": rng.normal(size=400)}
    )
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    write_sorted(_mkds(left), "t", lp, num_partitions=4)
    write_sorted(_mkds(r1), "rt", rp, num_partitions=3)
    append_sorted(_mkds(r2), rp, num_partitions=3)

    got = (
        sorted_asof_join(lp, rp)
        .to_pandas()
        .sort_values("ev")
        .reset_index(drop=True)
    )
    right = pd.concat([r1, r2], ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["t", "ev", "rt"]].astype({"rt": "int64"}),
        _expected(left, right, "backward"),
    )


def test_sorted_asof_merge_fn_and_projection(ray_session, tmp_path):
    from pynomaly_ray.sources.sorted_layout import sorted_asof_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "t": rng.integers(0, 1_000, 800),
            "ev": np.arange(800),
            "junk": rng.normal(size=800),
        }
    )
    right = pd.DataFrame(
        {"rt": rng.integers(0, 1_000, 200), "px": rng.normal(size=200)}
    )
    lp, rp = _layouts(tmp_path, left, right, lparts=3, rparts=3)

    def per_task(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [len(df)], "lag_sum": [(df.t - df.rt).sum()]})

    got = sorted_asof_join(
        lp,
        rp,
        merge_fn=per_task,
        columns_left=["ev"],
        columns_right=[],
    ).to_pandas()
    exp = _expected(left, right, "backward")
    assert got["n"].sum() == len(exp)
    assert got["lag_sum"].sum() == (exp.t - exp.rt).sum()


def test_sorted_asof_refuses_bad_inputs(ray_session, tmp_path):
    from pynomaly_ray.sources.sorted_layout import (
        asof_join_plan,
        write_sorted,
    )

    left = pd.DataFrame({"t": [1, 2], "ev": [0, 1]})
    rights = pd.DataFrame({"rt": ["a", "b"], "px": [0.0, 1.0]})
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    write_sorted(_mkds(left, 1), "t", lp)
    write_sorted(_mkds(rights, 1), "rt", rp)
    with pytest.raises(TypeError, match="key kinds differ"):
        asof_join_plan(lp, rp)
    with pytest.raises(ValueError, match="unknown asof direction"):
        asof_join_plan(lp, lp, "sideways")


# ---------------------------------------------------------------------------
# bucketed_asof_join (wave 40)
# ---------------------------------------------------------------------------
def _smb_layouts(tmp_path, left, right, buckets=8):
    from pynomaly_ray.sources.bucketed import write_bucketed

    lp, rp = str(tmp_path / "bl"), str(tmp_path / "br")
    write_bucketed(_mkds(left), ["uid"], buckets, lp)
    write_bucketed(_mkds(right), ["cid"], buckets, rp)
    return lp, rp


def _smb_expected(left, right, direction):
    ls = left.dropna(subset=["uid", "t"]).sort_values("t", kind="mergesort")
    rs = right.dropna(subset=["cid", "rt"]).sort_values("rt", kind="mergesort")
    exp = pd.merge_asof(
        ls,
        rs[["cid", "rt"]],
        left_on="t",
        right_on="rt",
        left_by="uid",
        right_by="cid",
        direction=direction,
    )
    return (
        exp[exp["rt"].notna()]
        .sort_values("ev")
        .reset_index(drop=True)[["uid", "t", "ev", "rt"]]
        .astype({"rt": "int64"})
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_bucketed_asof_join_matches_pandas(ray_session, tmp_path, direction):
    from pynomaly_ray.sources.bucketed import bucketed_asof_join

    rng = np.random.default_rng(17)
    left = pd.DataFrame(
        {
            "uid": rng.integers(0, 40, 2500),
            "t": rng.integers(0, 10_000, 2500),
            "ev": np.arange(2500),
        }
    )
    right = pd.DataFrame(
        {
            "cid": rng.integers(0, 55, 700),
            "rt": rng.integers(0, 10_000, 700),
            "px": rng.normal(size=700),
        }
    )
    lp, rp = _smb_layouts(tmp_path, left, right)
    got = (
        bucketed_asof_join(lp, rp, "t", "rt", direction=direction)
        .to_pandas()
        .sort_values("ev")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["uid", "t", "ev", "rt"]].astype({"rt": "int64"}),
        _smb_expected(left, right, direction),
    )


def test_bucketed_asof_null_keys_dropped(ray_session, tmp_path):
    from pynomaly_ray.sources.bucketed import bucketed_asof_join

    left = pd.DataFrame(
        {
            "uid": pd.array([1, None, 1, 2], dtype="Int64"),
            "t": pd.array([5, 5, None, 9], dtype="Int64"),
            "ev": range(4),
        }
    )
    right = pd.DataFrame(
        {
            "cid": pd.array([1, 2, None], dtype="Int64"),
            "rt": pd.array([3, None, 1], dtype="Int64"),
            "px": [1.0, 2.0, 3.0],
        }
    )
    lp, rp = _smb_layouts(tmp_path, left, right, buckets=4)
    got = (
        bucketed_asof_join(lp, rp, "t", "rt")
        .to_pandas()
        .sort_values("ev")
        .reset_index(drop=True)
    )
    # only ev=0 survives: uid=1 t=5 matches cid=1 rt=3.  ev=1 null uid,
    # ev=2 null t, ev=3 uid=2 whose only right row has null rt.
    assert list(got["ev"]) == [0]
    assert list(got["rt"]) == [3]


def test_bucketed_asof_merge_fn_collapses_in_bucket(ray_session, tmp_path):
    from pynomaly_ray.sources.bucketed import bucketed_asof_join

    rng = np.random.default_rng(23)
    left = pd.DataFrame(
        {
            "uid": rng.integers(0, 20, 1500),
            "t": rng.integers(0, 5_000, 1500),
            "ev": np.arange(1500),
        }
    )
    right = pd.DataFrame(
        {
            "cid": rng.integers(0, 20, 300),
            "rt": rng.integers(0, 5_000, 300),
            "px": rng.normal(size=300),
        }
    )
    lp, rp = _smb_layouts(tmp_path, left, right, buckets=16)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n": [len(df)], "lag": [(df["t"] - df["rt"]).sum()]}
        )

    got = bucketed_asof_join(lp, rp, "t", "rt", merge_fn=per_bucket).to_pandas()
    exp = _smb_expected(left, right, "backward")
    # 16 buckets over 20 uids: some buckets are empty — their collapsed
    # empty frames must share the schema (the regression this pins)
    assert len(got) == 16
    assert got["n"].sum() == len(exp)
    assert got["lag"].sum() == (exp["t"] - exp["rt"]).sum()


def test_bucketed_asof_refuses_mismatched_layouts(ray_session, tmp_path):
    from pynomaly_ray.sources.bucketed import (
        bucketed_asof_join,
        write_bucketed,
    )

    left = pd.DataFrame({"uid": [1, 2], "t": [1, 2], "ev": [0, 1]})
    right = pd.DataFrame({"cid": [1], "rt": [1], "px": [0.0]})
    lp, rp8 = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed(_mkds(left, 1), ["uid"], 4, lp)
    write_bucketed(_mkds(right, 1), ["cid"], 8, rp8)
    with pytest.raises(ValueError, match="bucket count mismatch"):
        bucketed_asof_join(lp, rp8, "t", "rt")
    with pytest.raises(ValueError, match="unknown asof direction"):
        bucketed_asof_join(lp, lp, "t", "t", direction="sideways")


# ---------------------------------------------------------------------------
# bm25_topk (wave 41)
# ---------------------------------------------------------------------------
def _bm25_local(docs, terms, k1=1.2, b=0.75):
    """Reference BM25 in plain python over a {doc_id: text} dict."""
    import math

    toks = {d: (t or "").split() for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(v) / avgdl)
            )
        if s > 0:
            scores[d] = s
    return scores


def test_bm25_topk_matches_local_reference(ray_session):
    import ray.data as rd

    from pynomaly_ray.stages.text import bm25_topk

    rng = np.random.default_rng(41)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = {
        i: " ".join(rng.choice(vocab, size=rng.integers(3, 30)))
        for i in range(200)
    }
    docs[200] = ""  # empty doc: counts in N and avgdl, never matches
    docs[201] = None  # NULL text likewise
    df = pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}
    )
    ds = rd.from_pandas(df).repartition(5)
    terms = ["alpha", "gamma", "nosuchterm"]
    got = bm25_topk(ds, terms, k=10)
    exp = _bm25_local(docs, terms)
    exp_top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["doc_id"]) == [d for d, _ in exp_top]
    np.testing.assert_allclose(
        got["score"].to_numpy(), [s for _, s in exp_top], rtol=1e-12
    )


def test_bm25_topk_no_matches_is_typed_empty(ray_session):
    import ray.data as rd

    from pynomaly_ray.stages.text import bm25_topk

    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "c d"]})
    )
    got = bm25_topk(ds, ["zzz"], k=5)
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "score"]


def test_bm25_topk_duplicate_terms_counted_once(ray_session):
    import ray.data as rd

    from pynomaly_ray.stages.text import bm25_topk

    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["x x y", "x z", "z z z"]}
        )
    ).repartition(2)
    once = bm25_topk(ds, ["x"], k=3)
    twice = bm25_topk(ds, ["x", "x"], k=3)
    pd.testing.assert_frame_equal(once, twice)


# ---------------------------------------------------------------------------
# compact_bucketed (wave 42)
# ---------------------------------------------------------------------------
def test_compact_bucketed_preserves_content(ray_session, tmp_path):
    import os

    from pynomaly_ray.sources.bucketed import (
        append_bucketed,
        bucketed_aggregate,
        compact_bucketed,
        load_manifest,
        write_bucketed,
    )

    rng = np.random.default_rng(42)

    def mk(n):
        return pd.DataFrame(
            {
                "uid": rng.integers(0, 30, n),
                "v": rng.integers(-50, 50, n),
            }
        )

    base, d1, d2 = mk(1000), mk(300), mk(200)
    path = str(tmp_path / "layout")
    write_bucketed(_mkds(base), ["uid"], 8, path)
    append_bucketed(_mkds(d1), path)
    append_bucketed(_mkds(d2), path)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("uid", sort=False)
            .agg(n=("v", "size"), s=("v", "sum"))
            .reset_index()
        )

    before = (
        bucketed_aggregate(path, per_bucket)
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    m = compact_bucketed(path)
    assert m["gen"] == 0
    assert m["rows"] == 1500
    # exactly one file per non-empty bucket, none named data-g*
    for i in range(8):
        files = [
            f
            for f in os.listdir(os.path.join(path, f"bucket={i}"))
            if f.endswith(".parquet")
        ]
        assert len(files) <= 1
        assert all(not f.startswith("data-g") for f in files)
    after = (
        bucketed_aggregate(path, per_bucket)
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(before, after)
    # appends keep working after a compaction (gen restarts)
    append_bucketed(_mkds(mk(100)), path)
    assert load_manifest(path)["rows"] == 1600


def test_cli_compact_both_layout_kinds(ray_session, tmp_path, capsys):
    import json
    import os

    from pynomaly_ray.cli import main
    from pynomaly_ray.sources.bucketed import append_bucketed
    from pynomaly_ray.sources.sorted_layout import append_sorted

    src = str(tmp_path / "src.parquet")
    pd.DataFrame(
        {"uid": np.arange(200) % 9, "t": np.arange(200)}
    ).to_parquet(src)

    bp = str(tmp_path / "b")
    assert main(
        ["layout", "--input", src, "--out", bp, "--mode", "bucketed",
         "--keys", "uid", "--partitions", "4"]
    ) == 0
    append_bucketed(_mkds(pd.DataFrame({"uid": [1, 2], "t": [900, 901]}), 1), bp)
    capsys.readouterr()
    assert main(["compact", "--path", bp]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec == {"mode": "bucketed", "files": 4, "rows": 202, "path": bp}

    sp = str(tmp_path / "s")
    assert main(
        ["layout", "--input", src, "--out", sp, "--mode", "sorted",
         "--keys", "t", "--partitions", "3"]
    ) == 0
    append_sorted(_mkds(pd.DataFrame({"uid": [0], "t": [1000]}), 1), sp, 1)
    capsys.readouterr()
    assert main(["compact", "--path", sp, "--partitions", "2"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["mode"] == "sorted" and rec["rows"] == 201

    assert main(["compact", "--path", str(tmp_path / "missing")]) == 2
