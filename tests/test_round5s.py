"""Wave-45 tests: CUSUM change detection, deterministic MLM masking,
ordered-sequence patterns, rolling median — semantics on crafted data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, table, rows):
    df = pd.DataFrame(rows)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / f"{table}.parquet"),
    )
    return str(tmp_path)


def _events(tmp_path, specs):
    """specs: list of (event_id, hour, user_id, event_type, value).
    ts written as timestamp[us], matching the real events table."""
    base = pd.Timestamp("2024-01-01")
    rows = [
        {
            "event_id": eid,
            "ts": base + pd.Timedelta(hours=h),
            "user_id": uid,
            "event_type": et,
            "value": float(v),
            "props": "{}",
        }
        for eid, h, uid, et, v in specs
    ]
    df = pd.DataFrame(rows)
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        t["ts"].cast(pa.timestamp("us")),
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


# ---------------------------------------------------------------------------
# cusum_shift
# ---------------------------------------------------------------------------


def test_cusum_detects_upward_shift(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave45 import q_cusum_shift

    # type 'a': counts per hour [1,1,1,1,4,4] -> k = 12//6 = 2,
    # y = [-1,-1,-1,-1,2,2]; S = [0,0,0,0,2,4] -> max 4 at hour 5.
    specs = []
    eid = 0
    for h, c in enumerate([1, 1, 1, 1, 4, 4]):
        for _ in range(c):
            specs.append((eid, h, 1, "a", 1.0))
            eid += 1
    sf = _events(tmp_path, specs)
    out = q_cusum_shift(sf).set_index("event_type")
    assert out.loc["a", "k_level"] == 2
    assert out.loc["a", "max_cusum"] == 4
    base_hour = pd.Timestamp("2024-01-01").value // 1000 // 3_600_000_000
    assert out.loc["a", "peak_hour"] == base_hour + 5


def test_cusum_flat_series_is_zero(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave45 import q_cusum_shift

    specs = []
    eid = 0
    for h in range(8):
        for _ in range(3):
            specs.append((eid, h, 1, "flat", 1.0))
            eid += 1
    sf = _events(tmp_path, specs)
    out = q_cusum_shift(sf).set_index("event_type")
    assert out.loc["flat", "max_cusum"] == 0
    # peak hour: the FIRST hour reaching the max (== first hour here)
    base_hour = pd.Timestamp("2024-01-01").value // 1000 // 3_600_000_000
    assert out.loc["flat", "peak_hour"] == base_hour


def test_cusum_recovers_after_dip(ray_session, tmp_path):
    """A dip resets the statistic: max(0, ...) clamps at zero, so a
    later shift is measured from the dip, not offset by it."""
    from pynomaly_ray.pipelines.queries_wave45 import q_cusum_shift

    # counts [5,1,1,5,5,1]: k = 18//6 = 3, y = [2,-2,-2,2,2,-2]
    # S = [2,0,0,2,4,2] -> max 4 at hour index 4
    specs = []
    eid = 0
    for h, c in enumerate([5, 1, 1, 5, 5, 1]):
        for _ in range(c):
            specs.append((eid, h, 1, "dip", 1.0))
            eid += 1
    sf = _events(tmp_path, specs)
    out = q_cusum_shift(sf).set_index("event_type")
    assert out.loc["dip", "max_cusum"] == 4
    base_hour = pd.Timestamp("2024-01-01").value // 1000 // 3_600_000_000
    assert out.loc["dip", "peak_hour"] == base_hour + 4


# ---------------------------------------------------------------------------
# mlm_mask
# ---------------------------------------------------------------------------


def test_mlm_mask_deterministic_and_exact(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave45 import (
        _MASK_A,
        _MASK_B,
        _MASK_PCT,
        q_mlm_mask,
    )

    toks = [f"w{i}" for i in range(40)]
    rows = [
        {"doc_id": 0, "text": " ".join(toks), "lang": "en", "source": "s",
         "n_chars": 1},
        {"doc_id": 17, "text": "solo", "lang": "en", "source": "s",
         "n_chars": 1},
        {"doc_id": 3, "text": "not sampled", "lang": "en", "source": "s",
         "n_chars": 1},
        {"doc_id": 34, "text": "", "lang": "en", "source": "s", "n_chars": 0},
    ]
    sf = _write(tmp_path, "documents", rows)
    out = q_mlm_mask(sf).set_index("doc_id")
    # doc 3 (not % 17) and doc 34 (zero tokens) are absent
    assert sorted(out.index) == [0, 17]
    expect = [
        "<X>" if (0 * _MASK_A + i * _MASK_B) % 100 < _MASK_PCT else t
        for i, t in enumerate(toks)
    ]
    assert out.loc[0, "corrupted"] == " ".join(expect)
    assert out.loc[0, "n_masked"] == sum(t == "<X>" for t in expect)
    solo_masked = (17 * _MASK_A + 0 * _MASK_B) % 100 < _MASK_PCT
    assert out.loc[17, "corrupted"] == ("<X>" if solo_masked else "solo")


def test_mlm_mask_batch_invariant(ray_session, tmp_path):
    """The mask depends only on (doc_id, idx): splitting the corpus
    into different files/batches must not change any corrupted text."""
    from pynomaly_ray.pipelines.queries_wave45 import q_mlm_mask

    rng = np.random.RandomState(7)
    rows = [
        {
            "doc_id": i * 17,
            "text": " ".join(
                f"t{rng.randint(100)}" for _ in range(rng.randint(1, 30))
            ),
            "lang": "en",
            "source": "s",
            "n_chars": 1,
        }
        for i in range(50)
    ]
    (tmp_path / "a").mkdir()
    sf_a = _write(tmp_path / "a", "documents", rows)
    (tmp_path / "b").mkdir()
    df = pd.DataFrame(rows)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "b" / "documents.parquet"),
        row_group_size=7,
    )
    a = q_mlm_mask(sf_a).sort_values("doc_id").reset_index(drop=True)
    b = q_mlm_mask(str(tmp_path / "b")).sort_values("doc_id").reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# line_flag_patterns
# ---------------------------------------------------------------------------


def test_line_flag_patterns_orders_and_counts(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave45 import q_line_flag_patterns

    def li(ok, ln, rf, ls):
        return {
            "l_orderkey": ok,
            "l_linenumber": ln,
            "l_returnflag": rf,
            "l_linestatus": ls,
        }

    rows = [
        # order 1: lines (2,'NO') then (1,'AF') -> pattern 'AFNO'
        li(1, 2, "N", "O"), li(1, 1, "A", "F"),
        # order 2: same pattern via different line numbers
        li(2, 5, "N", "O"), li(2, 3, "A", "F"),
        # order 3: duplicate line NUMBER, flag tie-break: 'AFNO' too
        li(3, 1, "N", "O"), li(3, 1, "A", "F"),
        # order 4: singleton
        li(4, 1, "R", "F"),
    ]
    sf = _write(tmp_path, "lineitem", rows)
    out = q_line_flag_patterns(sf)
    assert list(out.columns) == ["pattern", "cnt"]
    assert out.iloc[0]["pattern"] == "AFNO" and out.iloc[0]["cnt"] == 3
    assert out.iloc[1]["pattern"] == "RF" and out.iloc[1]["cnt"] == 1


# ---------------------------------------------------------------------------
# rolling_median
# ---------------------------------------------------------------------------


def test_rolling_median_warmup_and_window(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave45 import q_rolling_median

    # user 1 values: 10, 20, 90, 10, 10, 10 (cents: x100)
    # rolling(5) medians: 10, 15, 20, 15, 10, 10 -> med2x max = 40 at t3
    vals = [10, 20, 90, 10, 10, 10]
    specs = [(i, i, 1, "a", v) for i, v in enumerate(vals)]
    sf = _events(tmp_path, specs)
    out = q_rolling_median(sf).set_index("user_id")
    assert out.loc[1, "n_events"] == 6
    assert out.loc[1, "max_med2x"] == 2 * 2000  # median 20.00 -> cents
