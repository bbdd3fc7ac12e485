"""Wave-52 tests: k-anonymity bands, skip-gram window pairs, and
basis-point shares — semantics on crafted data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_k_anonymity_band_groups(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave52 import q_k_anonymity

    rows = []
    # segment S: one group of 5 (safe) in band 0, one group of 2
    # (risky) in band 1; negative balances floor into band -1
    for i in range(5):
        rows.append(("S", 1, 100.0))
    rows.append(("S", 1, 1500.0))
    rows.append(("S", 1, 1999.99))
    rows.append(("T", 2, -500.0))  # band -1, group of 1 -> risky
    df = pd.DataFrame(
        rows, columns=["c_mktsegment", "c_nationkey", "c_acctbal"]
    )
    df["c_custkey"] = np.arange(len(df), dtype=np.int64)
    df["c_name"] = "x"
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "customer.parquet"),
    )
    out = q_k_anonymity(str(tmp_path)).set_index("c_mktsegment")
    assert out.loc["S", "n_groups"] == 2
    assert out.loc["S", "n_small_groups"] == 1
    assert out.loc["S", "n_risky_rows"] == 2
    assert out.loc["T", "n_groups"] == 1
    assert out.loc["T", "n_risky_rows"] == 1


def test_skipgram_window_and_symmetry(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave52 import q_skipgram_pairs

    df = pd.DataFrame(
        {
            "doc_id": np.array([1], dtype=np.int64),
            "text": ["a b c"],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    out = q_skipgram_pairs(str(tmp_path))
    got = {(r.center, r.context): r.cnt for r in out.itertuples()}
    # window 2 over "a b c": every ordered pair appears exactly once
    expect = {
        ("a", "b"): 1,
        ("b", "a"): 1,
        ("b", "c"): 1,
        ("c", "b"): 1,
        ("a", "c"): 1,
        ("c", "a"): 1,
    }
    assert got == expect


def test_revenue_share_bps_sums_to_near_10000(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave52 import q_revenue_share_bps

    # region 0: nations 0 (75%) and 1 (25%); region 1: nation 2 (100%)
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int32()),
                "r_name": ["R0", "R1"],
            }
        ),
        str(tmp_path / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1, 2], pa.int32()),
                "n_name": ["N0", "N1", "N2"],
                "n_regionkey": pa.array([0, 0, 1], pa.int32()),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([10, 11, 12], pa.int64()),
                "s_nationkey": pa.array([0, 1, 2], pa.int32()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    li = pd.DataFrame(
        {
            "l_suppkey": np.array([10, 10, 10, 11, 12], dtype=np.int64),
            "l_extendedprice": [1.0, 1.0, 1.0, 1.0, 7.0],
            "l_discount": [0.0] * 5,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(li, preserve_index=False),
        str(tmp_path / "lineitem.parquet"),
    )
    out = q_revenue_share_bps(str(tmp_path)).set_index("n_name")
    assert out.loc["N0", "share_bps"] == 7500
    assert out.loc["N1", "share_bps"] == 2500
    assert out.loc["N2", "share_bps"] == 10000
    assert out.loc["N0", "r_name"] == "R0"
