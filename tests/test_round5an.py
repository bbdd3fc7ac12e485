"""Wave-65 tests: chained-window funnel semantics on crafted users."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_funnel_chained_windows(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave65 import q_funnel_steps3

    base = pd.Timestamp("2024-01-01")

    def ev(user, etype, hours):
        return (user, etype, base + pd.Timedelta(hours=hours))

    rows = [
        # user 1: full funnel inside both windows
        ev(1, "signup", 0),
        ev(1, "view", 1),
        ev(1, "purchase", 2),
        # user 2: view qualifies, purchase 25h after the VIEW -> out
        ev(2, "signup", 0),
        ev(2, "view", 10),
        ev(2, "purchase", 36),
        # user 3: view 30h after signup -> never reaches step 2; the
        # purchase right after would have qualified against the view
        ev(3, "signup", 0),
        ev(3, "view", 30),
        ev(3, "purchase", 31),
        # user 4: purchase BEFORE the view does not count; a later one
        # does (strict-after chaining); window anchors on the view
        ev(4, "signup", 0),
        ev(4, "purchase", 1),
        ev(4, "view", 2),
        ev(4, "purchase", 20),
        # user 5: no signup at all -> not even step 1
        ev(5, "view", 0),
        ev(5, "purchase", 1),
        # user 6: first-touch trap — EARLIEST signup anchors; the view
        # at 50h is outside [t1, t1+24] even though a second signup at
        # 40h would have caught it
        ev(6, "signup", 0),
        ev(6, "signup", 40),
        ev(6, "view", 50),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["value"] = 1.0
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    out = q_funnel_steps3(str(tmp_path))
    assert out.loc[0, "n_signup"] == 5  # users 1,2,3,4,6
    assert out.loc[0, "n_view24"] == 3  # users 1,2,4
    assert out.loc[0, "n_purchase24"] == 2  # users 1,4
