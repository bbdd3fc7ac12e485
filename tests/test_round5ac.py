"""Wave-55 tests: churn decomposition and linear credit sharing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _events(tmp_path, specs):
    """specs: (event_id, minutes, user_id, event_type)."""
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        [
            {
                "event_id": eid,
                "ts": base + pd.Timedelta(minutes=m),
                "user_id": uid,
                "event_type": et,
                "value": 1.0,
                "props": "{}",
            }
            for eid, m, uid, et in specs
        ]
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_hourly_churn_decomposition(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave55 import q_hourly_churn

    # hour 0: users 1,2 (both new). hour 1: users 1 (retained), 3 (new).
    # hour 3: user 1 again (gap -> new, not retained).
    sf = _events(
        tmp_path,
        [
            (0, 10, 1, "a"),
            (1, 20, 2, "a"),
            (2, 70, 1, "a"),
            (3, 80, 3, "a"),
            (4, 190, 1, "a"),
        ],
    )
    out = q_hourly_churn(sf)
    base_h = pd.Timestamp("2024-01-01").value // 1000 // 3_600_000_000
    out = out.set_index(out["hour"] - base_h)
    assert out.loc[0, "n_active"] == 2 and out.loc[0, "n_new"] == 2
    assert out.loc[1, "n_active"] == 2
    assert out.loc[1, "n_retained"] == 1 and out.loc[1, "n_new"] == 1
    assert out.loc[3, "n_retained"] == 0 and out.loc[3, "n_new"] == 1


def test_attribution_linear_shares_credit(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave55 import q_attribution_linear

    # purchase at 100min: touches in (ts-120m, ts): click@10m, view@50m,
    # click@99m -> 3 touches, each 3333 -> clicks 6666, views 3333.
    # purchase at 400min: no touch in window -> no credit.
    # view exactly AT purchase time is excluded (strict <).
    sf = _events(
        tmp_path,
        [
            (0, 10, 1, "click"),
            (1, 50, 1, "view"),
            (2, 99, 1, "click"),
            (3, 100, 1, "purchase"),
            (4, 400, 1, "purchase"),
            (5, 400, 1, "view"),
        ],
    )
    out = q_attribution_linear(sf).set_index("channel")
    assert out.loc["click", "credit_e4"] == 2 * (10_000 // 3)
    assert out.loc["click", "n_touches"] == 2
    assert out.loc["view", "credit_e4"] == 10_000 // 3
    assert out.loc["view", "n_touches"] == 1
