"""Wave-71 tests: crash-safe batch query runner (resume semantics)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq


def _run(argv):
    from pynomaly_ray.cli import main

    return main(argv)


def test_run_resume_skips_committed(ray_session, tmp_path, capsys):
    out = str(tmp_path / "batch")
    rc = _run(
        [
            "run",
            "--input",
            "/root/testdata/sf0.001",
            "--out",
            out,
            "--queries",
            "lineitem_agg,distinct_users",
        ]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ran"] == ["lineitem_agg", "distinct_users"]
    r1 = pq.read_table(os.path.join(out, "lineitem_agg", "result.parquet"))
    assert r1.num_rows > 0

    # simulate a crash AFTER lineitem_agg committed but BEFORE
    # distinct_users did: remove the second marker, leave partials
    os.remove(os.path.join(out, "distinct_users", "_done.json"))
    m1 = os.path.getmtime(os.path.join(out, "lineitem_agg", "_done.json"))
    rc = _run(
        [
            "run",
            "--input",
            "/root/testdata/sf0.001",
            "--out",
            out,
            "--queries",
            "lineitem_agg,distinct_users",
            "--resume",
        ]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["skipped"] == ["lineitem_agg"]
    assert rep["ran"] == ["distinct_users"]
    # the committed query was not touched
    assert os.path.getmtime(
        os.path.join(out, "lineitem_agg", "_done.json")
    ) == m1
    assert pq.read_table(
        os.path.join(out, "distinct_users", "result.parquet")
    ).num_rows > 0


def test_run_unknown_query_rc2(ray_session, tmp_path, capsys):
    rc = _run(
        [
            "run",
            "--input",
            "/root/testdata/sf0.001",
            "--out",
            str(tmp_path / "b"),
            "--queries",
            "lineitem_agg,nope",
        ]
    )
    assert rc == 2
    assert "unknown" in capsys.readouterr().out
