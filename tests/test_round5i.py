"""Property and edge tests for the final-wave operators: sweep-line
peak, bag difference, with-ties ranking, CEP matching, market share —
each checked against an independent brute-force on randomized input,
plus empty-side edges that the sf0.001 oracle pass cannot reach."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as papq
import pytest


def _write_events(tmp_path, df: pd.DataFrame) -> str:
    full = pd.DataFrame(
        {
            "event_id": df.get("event_id", pd.Series(range(len(df)))).to_numpy(
                np.int64
            ),
            # the corpus contract is timestamp[us]; a Python-list ts
            # silently infers ns and shifts every epoch bucket 1000x
            "ts": df["ts"].to_numpy().astype("datetime64[us]"),
            "user_id": df.get("user_id", pd.Series([1] * len(df))).to_numpy(
                np.int64
            ),
            "event_type": df["event_type"],
            "value": df.get("value", pd.Series([1.0] * len(df))).to_numpy(
                np.float64
            ),
            "props": ["{}"] * len(df),
        }
    )
    papq.write_table(
        pa.Table.from_pandas(full, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def test_peak_concurrency_matches_bruteforce_random(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_peak_concurrency

    rng = np.random.default_rng(23)
    n = 300
    base = np.datetime64("2000-06-01T00:00:00", "us")
    offs = rng.integers(0, 3 * 3600, n)  # seconds within 3h -> overlaps
    ts = base + (offs * 1_000_000).astype("timedelta64[us]")
    types = rng.choice(["view", "click"], n, p=[0.7, 0.3])
    sf = _write_events(
        tmp_path, pd.DataFrame({"ts": ts, "event_type": types})
    )
    out = q_peak_concurrency(sf)

    # brute force: sweep the +1/-1 deltas in (t, d) order, ends first
    s = np.sort(offs[types == "view"] * 1_000_000)
    events = sorted(
        [(int(t), 1) for t in s] + [(int(t) + 30 * 60 * 1_000_000, -1) for t in s],
        key=lambda x: (x[0], x[1]),
    )
    # group-level cumsum: all deltas at one (t, d) apply together
    peak, cur, i = 0, 0, 0
    while i < len(events):
        j = i
        while j < len(events) and events[j][:2] == events[i][:2]:
            cur += events[j][1]
            j += 1
        peak = max(peak, cur)
        i = j
    assert int(out["peak"].iloc[0]) == peak


def test_peak_concurrency_no_views(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_peak_concurrency

    base = np.datetime64("2000-06-01T00:00:00", "us")
    sf = _write_events(
        tmp_path,
        pd.DataFrame(
            {"ts": [base, base], "event_type": ["click", "error"]}
        ),
    )
    out = q_peak_concurrency(sf)
    assert int(out["peak"].iloc[0]) == 0
    assert int(out["n_keys"].iloc[0]) == 0


def test_bag_difference_matches_counter(ray_session, tmp_path):
    from collections import Counter

    from pynomaly_ray.pipelines.queries import q_bag_difference

    rng = np.random.default_rng(5)
    n = 400
    base = np.datetime64("2000-06-01T00:00:00", "us")
    users = rng.integers(0, 30, n)
    types = rng.choice(["click", "error", "view"], n)
    sf = _write_events(
        tmp_path,
        pd.DataFrame(
            {
                "ts": [base] * n,
                "event_type": types,
                "user_id": users,
                "event_id": np.arange(n),
            }
        ),
    )
    out = q_bag_difference(sf)
    clicks = Counter(users[types == "click"].tolist())
    errors = Counter(users[types == "error"].tolist())
    want = {
        u: c - errors.get(u, 0)
        for u, c in clicks.items()
        if c - errors.get(u, 0) > 0
    }
    got = dict(zip(out["user_id"], out["mult"]))
    assert got == want


def test_top_values_with_ties_matches_pandas_rank(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_top_values_with_ties

    rng = np.random.default_rng(9)
    n = 500
    base = np.datetime64("2000-06-01T00:00:00", "us")
    types = rng.choice(["a", "b", "c"], n)
    vals = rng.uniform(0, 500, n)
    sf = _write_events(
        tmp_path,
        pd.DataFrame(
            {
                "ts": [base] * n,
                "event_type": types,
                "value": vals,
                "event_id": np.arange(n),
            }
        ),
    )
    out = q_top_values_with_ties(sf)
    df = pd.DataFrame(
        {
            "event_type": types,
            "event_id": np.arange(n),
            "band": np.floor(vals / 100.0).astype(np.int64),
        }
    )
    rk = df.groupby("event_type")["band"].rank(method="dense", ascending=False)
    want = (
        df[rk <= 2]
        .sort_values(["event_type", "event_id"])
        .reset_index(drop=True)
    )
    got = out.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_type", "event_id", "band"]],
        want[["event_type", "event_id", "band"]],
        check_dtype=False,
    )


def test_event_pattern_matches_single_user_sequence(ray_session, tmp_path):
    """Known sequence c v v p c p e c v -> 2 matches of c[ve]*p."""
    from pynomaly_ray.pipelines.queries import q_event_pattern_matches

    seq = ["click", "view", "view", "purchase", "click", "purchase",
           "error", "click", "view"]
    base = np.datetime64("2000-06-01T00:00:00", "us")
    ts = base + (np.arange(len(seq)) * 1_000_000).astype("timedelta64[us]")
    sf = _write_events(
        tmp_path,
        pd.DataFrame(
            {
                "ts": ts,
                "event_type": seq,
                "user_id": np.ones(len(seq), np.int64),
                "event_id": np.arange(len(seq)),
            }
        ),
    )
    out = q_event_pattern_matches(sf)
    assert len(out) == 1
    assert int(out["n_matches"].iloc[0]) == 2
    assert int(out["n_events"].iloc[0]) == len(seq)


def test_attribution_no_clicks_is_empty(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_attribution_last_touch

    base = np.datetime64("2000-06-01T00:00:00", "us")
    sf = _write_events(
        tmp_path,
        pd.DataFrame(
            {
                "ts": [base, base],
                "event_type": ["purchase", "purchase"],
                "user_id": np.int64([1, 2]),
                "event_id": np.int64([0, 1]),
            }
        ),
    )
    out = q_attribution_last_touch(sf)
    assert len(out) == 0


def test_hourly_gap_fill_spine_is_dense(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_hourly_gap_fill

    base = np.datetime64("2000-06-01T00:00:00", "us")
    # clicks in hour 0 and hour 5 only -> spine must carry hours 1-4 as 0
    ts = [base, base + np.timedelta64(5, "h")]
    sf = _write_events(
        tmp_path,
        pd.DataFrame({"ts": ts, "event_type": ["click", "click"]}),
    )
    out = q_hourly_gap_fill(sf)
    assert len(out) == 6
    assert out["cnt"].tolist() == [1, 0, 0, 0, 0, 1]
    assert np.all(np.diff(out["hour"].to_numpy()) == 1)
    assert out["sum3"].tolist() == [1, 1, 0, 0, 1, 1]
    assert out["n3"].tolist() == [2, 3, 3, 3, 3, 2]


def test_new_queries_empty_corpus_typed(ray_session, tmp_path):
    """A corpus whose filters leave nothing must yield typed empties,
    not KeyErrors from Ray's skipped-on-empty schemaless blocks."""
    import pyarrow.parquet as papq

    from pynomaly_ray.pipelines.queries import (
        q_bag_difference,
        q_top_values_with_ties,
    )

    ev = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype=np.int64),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "user_id": pd.Series([], dtype=np.int64),
            "event_type": pd.Series([], dtype=object),
            "value": pd.Series([], dtype=np.float64),
            "props": pd.Series([], dtype=object),
        }
    )
    papq.write_table(
        pa.Table.from_pandas(ev, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    out = q_bag_difference(str(tmp_path))
    assert len(out) == 0 and list(out.columns) == ["user_id", "mult"]
    out = q_top_values_with_ties(str(tmp_path))
    assert len(out) == 0 and list(out.columns) == [
        "event_type",
        "event_id",
        "band",
    ]
