"""Wave-68 tests: MG matview aggregate — exact regime, undercount
bound past the budget, NUL-safe tokens, retraction rejection."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _delta(keys, vals):
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array(keys, pa.string()),
                "v": pa.array([str(v) for v in vals], pa.string()),
            }
        )
    )


def test_mg_view_exact_under_budget(ray_session, tmp_path):
    from pynomaly_ray.state.matview import (
        create_matview,
        mg_top,
        read_matview,
        refresh_matview,
    )

    view = str(tmp_path / "v")
    # 10 distinct values << _MG_K=64 -> exact counters across refreshes
    rng = np.random.RandomState(0)
    a = rng.randint(0, 10, 300)
    b = rng.randint(0, 10, 200)
    create_matview(
        view, _delta(["g"] * 300, a), ["k"], {"hh": ("v", "mg")}, run_id="r0"
    )
    refresh_matview(view, _delta(["g"] * 200, b), "r1")
    state = read_matview(view).to_pandas()
    top = mg_top(state, "hh", 10)
    exact = pd.Series([str(x) for x in np.concatenate([a, b])]).value_counts()
    for r in top.itertuples():
        assert r.cnt == exact[r.item]
    assert len(top) == 10


def test_mg_prune_one_sided_undercount(ray_session, tmp_path):
    from pynomaly_ray.state.matview import (
        create_matview,
        mg_top,
        read_matview,
    )

    view = str(tmp_path / "v")
    # 500 distinct values >> 64 counters, one planted heavy hitter
    vals = [f"t{i}" for i in range(500)] * 2 + ["heavy"] * 400
    create_matview(
        view,
        _delta(["g"] * len(vals), vals),
        ["k"],
        {"hh": ("v", "mg")},
        run_id="r0",
    )
    top = mg_top(read_matview(view).to_pandas(), "hh", 64)
    got = {r.item: r.cnt for r in top.itertuples()}
    assert "heavy" in got
    # one-sided: estimates never exceed exact counts
    assert got["heavy"] <= 400
    for item, cnt in got.items():
        exact = 400 if item == "heavy" else 2
        assert cnt <= exact
    # undercount bound: levels * N / (k+1); the heavy survivor must
    # retain most of its mass
    assert got["heavy"] >= 400 - 2 * len(vals) // 65


def test_mg_nul_tokens_stay_distinct(ray_session, tmp_path):
    from pynomaly_ray.state.matview import (
        create_matview,
        mg_top,
        read_matview,
    )

    view = str(tmp_path / "v")
    vals = ["a", "a\x00b", "a\x00b", "a\x00c"]
    create_matview(
        view,
        _delta(["g"] * 4, vals),
        ["k"],
        {"hh": ("v", "mg")},
        run_id="r0",
    )
    top = mg_top(read_matview(view).to_pandas(), "hh", 10)
    got = {r.item: r.cnt for r in top.itertuples()}
    assert got == {"a": 1, "a\x00b": 2, "a\x00c": 1}


def test_mg_retraction_rejected(ray_session, tmp_path):
    from pynomaly_ray.state.matview import create_matview, retract_matview

    view = str(tmp_path / "v")
    create_matview(
        view,
        _delta(["g"], ["x"]),
        ["k"],
        {"hh": ("v", "mg"), "n": (None, "count")},
        run_id="r0",
    )
    with pytest.raises(ValueError, match="sign-invertible"):
        retract_matview(view, _delta(["g"], ["x"]), "r1")
