"""Round-5 wave-8 operators: inter-arrival gaps, MAD outliers, column
profile — handcrafted-input semantics the sf oracles cannot pin
(null handling, even-count lower-median, single-event users)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as papq


def _write(tmp_path, table: str, df: pd.DataFrame) -> str:
    papq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(tmp_path, f"{table}.parquet"),
    )
    return str(tmp_path)


def test_event_gaps_handcrafted(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_event_gaps

    ts = pd.to_datetime(
        [
            "2026-01-01 00:00:00",
            "2026-01-01 00:00:10",
            "2026-01-01 00:01:00",
            "2026-01-02 00:00:00",  # user 2: single event -> no gap row
            "2026-01-03 00:00:00",
            "2026-01-03 00:00:00",  # user 3: duplicate ts -> gap 0
        ]
    ).astype("datetime64[us]")
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame({"user_id": [1, 1, 1, 2, 3, 3], "ts": ts}),
    )
    out = q_event_gaps(sf)
    assert list(out["user_id"]) == [1, 3]
    assert list(out["n_gaps"]) == [2, 1]
    assert list(out["total_gap_us"]) == [60_000_000, 0]
    assert list(out["max_gap_us"]) == [50_000_000, 0]


def test_mad_outliers_lower_median_and_nulls(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_mad_outliers

    # 6 non-null values -> lower median (k=(6+1)//2=3rd smallest).
    # v_e6: [1, 2, 3, 4, 5, 1000] -> median=3e6; dev=[2,1,0,1,2,997]e6,
    # lower median of dev = 1e6 (MAD); outlier iff dev > 5e6 -> only 1000.
    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_type": ["a", "a", "b", "b", "b", "c", "c"],
                "value": [1.0, 2.0, 3.0, 4.0, 5.0, 1000.0, None],
            }
        ),
    )
    out = q_mad_outliers(sf)
    assert list(out["event_type"]) == ["c"]
    assert list(out["n_out"]) == [1]


def test_table_profile_nulls_and_distinct(ray_session, tmp_path):
    from pynomaly_ray.pipelines import queries as Q

    sf = _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            {
                "l_discount": [0.01, 0.01, None, 0.05],
                "l_extendedprice": [10.0, 20.0, 30.0, 40.0],
                "l_quantity": [1.0, 1.0, 1.0, 1.0],
                "l_tax": [None, None, None, None],
            }
        ),
    )
    out = Q.q_table_profile(sf)
    prof = {r.col_name: r for r in out.itertuples()}
    assert prof["l_discount"].n_rows == 4
    assert prof["l_discount"].n_null == 1
    assert prof["l_discount"].n_distinct == 2
    assert prof["l_discount"].min_e6 == 10_000
    assert prof["l_discount"].max_e6 == 50_000
    assert prof["l_extendedprice"].n_distinct == 4
    assert prof["l_quantity"].n_distinct == 1
    # all-null column: zero values, null min/max (pandas NaN -> <NA>)
    assert prof["l_tax"].n_null == 4
    assert prof["l_tax"].n_distinct == 0
    assert pd.isna(prof["l_tax"].min_e6)


def test_mad_outliers_all_inliers_empty(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_mad_outliers

    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame({"event_type": ["a"] * 5, "value": [1.0, 2.0, 3.0, 4.0, 5.0]}),
    )
    out = q_mad_outliers(sf)
    assert len(out) == 0
    assert list(out.columns) == ["event_type", "n_out"]
