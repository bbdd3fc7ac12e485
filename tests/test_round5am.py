"""Wave-64 tests: exact decile thresholds and tie determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, values, types):
    n = len(values)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Series(
                pd.to_datetime("2024-01-01")
                + pd.to_timedelta(np.arange(n), unit="m")
            ).astype("datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": types,
            "value": np.asarray(values, dtype=np.float64),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )


def test_deciles_uniform_values(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave64 import q_value_decile_profile

    # 20 distinct values 1..20 -> two per decile; purchases on evens
    vals = np.arange(1, 21, dtype=float)
    types = ["purchase" if v % 2 == 0 else "view" for v in vals]
    _write(tmp_path, vals, types)
    out = q_value_decile_profile(str(tmp_path))
    assert list(out["decile"]) == list(range(10))
    assert (out["n"] == 2).all()
    assert (out["n_purchase"] == 1).all()


def test_deciles_heavy_ties_deterministic(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave64 import q_value_decile_profile

    # 90% identical values: the tied mass lands in ONE bucket (0) and
    # most decile labels are empty — the deterministic-ties contract
    vals = [5.0] * 90 + list(range(100, 110))
    types = ["view"] * 95 + ["purchase"] * 5
    _write(tmp_path, vals, types)
    out = q_value_decile_profile(str(tmp_path)).set_index("decile")
    assert out.loc[0, "n"] == 90
    assert int(out["n"].sum()) == 100
    assert int(out["n_purchase"].sum()) == 5
