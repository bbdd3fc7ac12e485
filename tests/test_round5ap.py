"""Wave-67 tests: rolling-WAU window semantics (gap days, cap at max
day, distinctness across repeated activity)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_weekly_active_users_handchecked(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave67 import q_weekly_active_users

    base = pd.Timestamp("2024-01-01")
    # user 1 active on days 0 and 1 (twice on day 0 -> distinct once);
    # user 2 active on day 0 only; user 3 active on day 20 (a >6-day
    # gap: days 7..19 must be ABSENT, not zero)
    rows = [
        (1, 0),
        (1, 0),
        (1, 1),
        (2, 0),
        (3, 20),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "day"])
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["ts"] = pd.Series(
        [base + pd.Timedelta(days=int(d), hours=3) for d in df["day"]]
    ).astype("datetime64[us]")
    df["event_type"] = "view"
    df["value"] = 1.0
    pq.write_table(
        pa.Table.from_pandas(
            df[["event_id", "ts", "user_id", "event_type", "value"]],
            preserve_index=False,
        ),
        str(tmp_path / "events.parquet"),
    )
    out = q_weekly_active_users(str(tmp_path))
    got = dict(zip(out["day"] - out["day"].min(), out["wau"]))
    # windows: day 0 -> users {1,2}; days 1..6 -> {1,2} (1 also via day
    # 1); day 7 -> {1} (day-1 activity still in window); day 20 -> {3}
    assert got[0] == 2
    for d in range(1, 7):
        assert got[d] == 2
    assert got[7] == 1
    assert got[20] == 1
    # gap days 8..19 absent; nothing past the max activity day
    assert set(got) == set(range(8)) | {20}
