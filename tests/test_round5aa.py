"""Wave-53 tests: nearest temporal join candidate selection and
point-in-time SCD2 state."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _events(tmp_path, specs):
    """specs: (event_id, us_offset, user_id, event_type) with ts =
    2024-01-01 + offset microseconds."""
    base = pd.Timestamp("2024-01-01").value // 1000
    df = pd.DataFrame(
        [
            {
                "event_id": eid,
                "ts": pd.Timestamp((base + us) * 1000),
                "user_id": uid,
                "event_type": et,
                "value": 1.0,
                "props": "{}",
            }
            for eid, us, uid, et in specs
        ]
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_nearest_join_picks_closer_side(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave53 import q_nearest_event_join

    sf = _events(
        tmp_path,
        [
            # user 1: clicks at 0 and 100; errors at 30 (back closer)
            # and 80 (fwd closer: 20 vs 80)
            (0, 0, 1, "click"),
            (1, 100, 1, "click"),
            (2, 30, 1, "error"),
            (3, 80, 1, "error"),
            # user 2: error with no click -> unmatched, absent
            (4, 50, 2, "error"),
            # user 3: click only -> no errors, absent
            (5, 10, 3, "click"),
        ],
    )
    out = q_nearest_event_join(sf).set_index("user_id")
    assert out.loc[1, "n_matched"] == 2
    assert out.loc[1, "sum_abs_gap_us"] == 30 + 20
    assert 2 not in out.index and 3 not in out.index


def test_nearest_join_boundary_users(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave53 import q_nearest_event_join

    # user 1's error must not see user 2's click even though it is the
    # globally nearest timestamp (offset-key block isolation)
    sf = _events(
        tmp_path,
        [
            (0, 1000, 1, "error"),
            (1, 1001, 2, "click"),
            (2, 5000, 1, "click"),
            (3, 900, 2, "error"),
        ],
    )
    out = q_nearest_event_join(sf).set_index("user_id")
    assert out.loc[1, "sum_abs_gap_us"] == 4000
    assert out.loc[2, "sum_abs_gap_us"] == 101


def test_as_of_state_counts_live_versions(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave53 import (
        _T_US,
        q_as_of_state,
    )

    base = pd.Timestamp("2024-01-01").value // 1000
    before = _T_US - base - 1_000_000
    after = _T_US - base + 1_000_000
    sf = _events(
        tmp_path,
        [
            # user 1: 'a' before T, switches to 'b' after T -> 'a' at T
            (0, before, 1, "a"),
            (1, after, 1, "b"),
            # user 2: 'b' before T, open-ended -> 'b' at T
            (2, before - 5, 2, "b"),
            # user 3: first event after T -> no state at T
            (3, after, 3, "c"),
        ],
    )
    out = q_as_of_state(sf).set_index("event_type")
    assert out.loc["a", "n_users"] == 1
    assert out.loc["b", "n_users"] == 1
    assert "c" not in out.index
