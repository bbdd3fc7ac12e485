"""Wave-62 tests: hourly lag-1 autocorrelation statistics on a
hand-checkable series (including gap hours counted as zero)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_hourly_autocorr_handchecked(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave62 import q_hourly_autocorr

    # type A: hours 0,0,1,3 -> dense series over global span [0..3]:
    # x = [2,1,0,1]; sx=4, sxx=6, sxy = 2*1 + 1*0 + 0*1 = 2
    # type B: single event at hour 2 -> x=[0,0,1,0]; sx=1,sxx=1,sxy=0
    base = pd.Timestamp("2024-01-01")
    hours = [0, 0, 1, 3, 2]
    types = ["A", "A", "A", "A", "B"]
    df = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            # the real events schema is timestamp[us]; pandas defaults
            # to [ns] which would shift the integer hour arithmetic
            "ts": pd.Series(
                [base + pd.Timedelta(hours=h, minutes=5) for h in hours]
            ).astype("datetime64[us]"),
            "user_id": np.ones(5, dtype=np.int64),
            "event_type": types,
            "value": np.ones(5),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    out = q_hourly_autocorr(str(tmp_path)).set_index("event_type")
    assert (out["n"] == 4).all()
    assert out.loc["A", "sx"] == 4
    assert out.loc["A", "sxx"] == 6
    assert out.loc["A", "sxy"] == 2
    assert out.loc["B", "sx"] == 1
    assert out.loc["B", "sxx"] == 1
    assert out.loc["B", "sxy"] == 0
