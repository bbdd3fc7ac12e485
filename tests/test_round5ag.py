"""Wave-59 tests: co-activity projection and exact Gini numerator."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _events(tmp_path, specs):
    """specs: (event_id, hour, user_id, value)."""
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        [
            {
                "event_id": eid,
                "ts": base + pd.Timedelta(hours=h, minutes=eid % 30),
                "user_id": uid,
                "event_type": "a",
                "value": float(v),
                "props": "{}",
            }
            for eid, h, uid, v in specs
        ]
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_coactive_pairs_counts_shared_hours(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave59 import q_coactive_pairs

    # users 1,2 share hours 0 and 1; users 1,3 share hour 0 only;
    # duplicate events within an hour must not double-count
    sf = _events(
        tmp_path,
        [
            (0, 0, 1, 1),
            (1, 0, 1, 1),  # dup (hour 0, user 1)
            (2, 0, 2, 1),
            (3, 0, 3, 1),
            (4, 1, 1, 1),
            (5, 1, 2, 1),
        ],
    )
    out = q_coactive_pairs(sf)
    got = {(r.u1, r.u2): r.cnt for r in out.itertuples()}
    assert got[(1, 2)] == 2
    assert got[(1, 3)] == 1
    assert got[(2, 3)] == 1
    assert out.iloc[0]["cnt"] == 2


def test_gini_numerator_exact(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave59 import q_gini_dispersion

    # values 1.00, 2.00, 4.00: sum over unordered pairs of |xi - xj|
    # = 100 + 300 + 200 = 600 = sum_i (2i - n + 1) * x_(i)
    sf = _events(
        tmp_path,
        [(0, 0, 1, 1.00), (1, 0, 1, 2.00), (2, 0, 1, 4.00)],
    )
    out = q_gini_dispersion(sf).set_index("event_type")
    assert out.loc["a", "gini_num"] == 600
    assert out.loc["a", "n"] == 3
