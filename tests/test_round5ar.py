"""Wave-69 tests: Q6 predicate semantics incl. the fully-pruned read."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_lineitem(tmp_path, rows):
    df = pd.DataFrame(
        rows,
        columns=["l_shipdate", "l_extendedprice", "l_discount", "l_quantity"],
    )
    df["l_shipdate"] = pd.to_datetime(df["l_shipdate"]).astype("datetime64[us]")
    df["l_orderkey"] = np.arange(len(df), dtype=np.int64)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "lineitem.parquet"),
    )


def test_q6_boundaries(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave69 import q_forecast_revenue

    _write_lineitem(
        tmp_path,
        [
            ("1996-06-01", 100.0, 0.05, 10),   # in: 10000 * 5
            ("1996-06-01", 100.0, 0.07, 23),   # in: 10000 * 7
            ("1996-06-01", 100.0, 0.04, 10),   # discount below band
            ("1996-06-01", 100.0, 0.08, 10),   # discount above band
            ("1996-06-01", 100.0, 0.06, 24),   # quantity at limit -> out
            ("1995-12-31", 100.0, 0.06, 10),   # before window
            ("1997-01-01", 100.0, 0.06, 10),   # at exclusive end -> out
        ],
    )
    out = q_forecast_revenue(str(tmp_path))
    assert out.loc[0, "revenue_e4"] == 10000 * 5 + 10000 * 7


def test_q6_fully_pruned_window(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave69 import q_forecast_revenue

    # every row outside the pushdown window: the read prunes everything
    # (Ray ships schemaless empty blocks) and the sum must be 0, not a
    # crash or a NaN
    _write_lineitem(tmp_path, [("2001-01-01", 100.0, 0.06, 10)] * 5)
    out = q_forecast_revenue(str(tmp_path))
    assert out.loc[0, "revenue_e4"] == 0
