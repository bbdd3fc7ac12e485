"""Wave-50 tests: SCD2 interval semantics and lower weighted median."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_OPEN = 1 << 62


def test_scd2_collapses_runs_and_closes_versions(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave50 import q_scd2_intervals

    base = pd.Timestamp("2024-01-01")
    # user 1: a a b a  -> versions a[0,2) b[2,3) a[3,open)
    # user 2: c        -> c[0,open)
    specs = [
        (0, 0, 1, "a"),
        (1, 1, 1, "a"),
        (2, 2, 1, "b"),
        (3, 3, 1, "a"),
        (4, 0, 2, "c"),
    ]
    df = pd.DataFrame(
        [
            {
                "event_id": eid,
                "ts": base + pd.Timedelta(hours=h),
                "user_id": uid,
                "event_type": et,
                "value": 1.0,
                "props": "{}",
            }
            for eid, h, uid, et in specs
        ]
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_scd2_intervals(str(tmp_path))
    u1 = out[out["user_id"] == 1].reset_index(drop=True)
    base_us = base.value // 1000
    h = 3_600_000_000
    assert u1["event_type"].tolist() == ["a", "b", "a"]
    assert u1["valid_from_us"].tolist() == [base_us, base_us + 2 * h, base_us + 3 * h]
    assert u1["valid_to_us"].tolist() == [base_us + 2 * h, base_us + 3 * h, _OPEN]
    u2 = out[out["user_id"] == 2]
    assert u2["valid_to_us"].tolist() == [_OPEN]


def test_weighted_median_lower_rule(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave50 import q_weighted_median_price

    # flag A: prices 1.00 (qty 1), 2.00 (qty 1), 3.00 (qty 2):
    #   total 4, 2*cum at 2.00 is 4 >= 4 -> lower weighted median 200
    # flag B: single row -> its own median
    df = pd.DataFrame(
        {
            "l_returnflag": ["A", "A", "A", "B"],
            "l_extendedprice": [1.00, 2.00, 3.00, 9.00],
            "l_quantity": [1.0, 1.0, 2.0, 5.0],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "lineitem.parquet"),
    )
    out = q_weighted_median_price(str(tmp_path)).set_index("l_returnflag")
    assert out.loc["A", "w_median_cents"] == 200
    assert out.loc["A", "total_qty"] == 4
    assert out.loc["B", "w_median_cents"] == 900
    assert out.loc["B", "total_qty"] == 5
