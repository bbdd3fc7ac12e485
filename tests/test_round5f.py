"""Edge-case tests for the round-5 sixth-session operators
(ntile_buckets, median_interp, corr_moments, table_diff).  Oracle
parity at sf0.001 is covered by the parametrized
test_query_matches_oracle sweep; these pin the hand-checkable corner
semantics."""

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


def test_ntile_remainder_distribution(ray_session, tmp_path):
    """n=6, k=4 -> tile sizes 2,2,1,1 (first n%k tiles get the extra
    row), boundaries on the sorted value order."""
    from pynomaly_ray.pipelines.queries import q_ntile_buckets

    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_type": ["a"] * 6,
                "event_id": [1, 2, 3, 4, 5, 6],
                "value": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
            }
        ),
    )
    out = q_ntile_buckets(sf).set_index("tile")
    assert out["n"].tolist() == [2, 2, 1, 1]
    assert out.loc[1, "min_e6"] == 10_000_000
    assert out.loc[1, "max_e6"] == 20_000_000
    assert out.loc[3, "min_e6"] == out.loc[3, "max_e6"] == 50_000_000


def test_ntile_fewer_rows_than_tiles_and_nulls(ray_session, tmp_path):
    """n < k: every row its own tile, no empty tiles emitted; NULL
    values excluded on both sides."""
    from pynomaly_ray.pipelines.queries import q_ntile_buckets

    sf = _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_type": ["a", "a", "a"],
                "event_id": [1, 2, 3],
                "value": [5.0, None, 7.0],
            }
        ),
    )
    out = q_ntile_buckets(sf)
    assert out["tile"].tolist() == [1, 2]
    assert out["n"].tolist() == [1, 1]


def test_median_interp_even_and_odd(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_median_interp

    sf = _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "source": ["e", "e", "e", "e", "o", "o", "o"],
                "n_chars": [1, 3, 5, 100, 2, 9, 4],
            }
        ),
    )
    out = q_median_interp(sf).set_index("source")
    # even group sorted [1,3,5,100]: middles 3+5 = 8
    assert out.loc["e", "median_x2"] == 8
    # odd group sorted [2,4,9]: middle 4 counted twice
    assert out.loc["o", "median_x2"] == 8


def test_corr_moments_exact(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_corr_moments

    sf = _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            {
                "l_returnflag": ["A", "A", "B"],
                "l_quantity": [2.0, 3.0, 10.0],
                "l_extendedprice": [100.0, 200.0, 50.0],
            }
        ),
    )
    out = q_corr_moments(sf).set_index("l_returnflag")
    assert out.loc["A", "n"] == 2
    assert out.loc["A", "sum_q"] == 5
    assert out.loc["A", "sum_p"] == 300
    assert out.loc["A", "sum_qq"] == 13
    assert out.loc["A", "sum_pp"] == 50_000
    assert out.loc["A", "sum_qp"] == 800
    assert out.loc["B", "sum_qp"] == 500


def test_table_diff_statuses(ray_session, tmp_path):
    """Keys: 97 removed, 101 changed, 89 added (as 89+1e9), 97*101
    removal wins over change, plain key absent from the diff."""
    from pynomaly_ray.pipelines.queries import q_table_diff

    keys = [97, 101, 89, 7, 97 * 101]
    sf = _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": keys,
                "o_totalprice": [10.0, 20.0, 30.0, 40.0, 50.0],
            }
        ),
    )
    out = q_table_diff(sf)
    got = dict(zip(out["orderkey"], out["status"]))
    assert got[97] == "removed"
    assert got[101] == "changed"
    assert got[89 + 1_000_000_000] == "added"
    assert got[97 * 101] == "removed"
    assert 7 not in got
    # 89 itself is unchanged in B, so only its shifted insert appears
    assert 89 not in got
    assert len(got) == 4


def test_table_diff_unchanged_empty(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries import q_table_diff

    sf = _write(
        tmp_path,
        "orders",
        pd.DataFrame({"o_orderkey": [1, 2, 3], "o_totalprice": [1.0, 2.0, 3.0]}),
    )
    out = q_table_diff(sf)
    assert len(out) == 0
    assert list(out.columns) == ["orderkey", "status"]
