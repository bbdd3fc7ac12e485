"""Wave-47 tests: FD violation profiling, cross-table reconciliation,
integer-exact profile drift — semantics on crafted data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_fd_profile_ranks_violating_keys(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave47 import q_fd_profile

    df = pd.DataFrame(
        {
            # part 1 -> 3 suppliers, part 3 -> 2, part 2 -> 1 (holds)
            "l_partkey": np.array([1, 1, 1, 1, 2, 2, 3, 3], dtype=np.int64),
            "l_suppkey": np.array([1, 2, 3, 3, 1, 1, 5, 6], dtype=np.int64),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "lineitem.parquet"),
    )
    out = q_fd_profile(str(tmp_path))
    assert out["l_partkey"].tolist() == [1, 3, 2]
    assert out["n_deps"].tolist() == [3, 2, 1]


def test_order_reconciliation_counts_and_diffs(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave47 import q_order_reconciliation

    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2, 3], dtype=np.int64),
            "o_orderstatus": ["O", "O", "F"],
            "o_totalprice": [10.00, 5.00, 7.00],
        }
    )
    # order 1 reconciles (2 lines -> 1000 cents); order 2 is 1 cent
    # short; order 3 has no lines (diff = full 700-cent header)
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 1, 2], dtype=np.int64),
            "l_extendedprice": [6.00, 4.00, 4.99],
            "l_discount": [0.0, 0.0, 0.0],
            "l_tax": [0.0, 0.0, 0.0],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(orders, preserve_index=False),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(li, preserve_index=False),
        str(tmp_path / "lineitem.parquet"),
    )
    out = q_order_reconciliation(str(tmp_path)).set_index("o_orderstatus")
    assert out.loc["O", "n_orders"] == 2
    assert out.loc["O", "n_mismatch"] == 1
    assert out.loc["O", "max_abs_diff_cents"] == 1
    assert out.loc["F", "n_orders"] == 1
    assert out.loc["F", "n_mismatch"] == 1
    assert out.loc["F", "max_abs_diff_cents"] == 700


def test_profile_drift_cross_multiplied_flags(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave47 import q_profile_drift

    rows = []
    for src, chars in [
        ("A", [100, 100]),  # mean 100 vs global 400 -> drifted
        ("B", [100, 100]),
        ("C", [1000, 1000]),  # mean 1000 -> drifted
        ("D", [400, 400]),  # mean == global mean exactly -> not drifted
    ]:
        for c in chars:
            rows.append({"doc_id": len(rows), "source": src, "n_chars": c})
    df = pd.DataFrame(rows)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    out = q_profile_drift(str(tmp_path)).set_index("source")
    assert out.loc["A", "drifted"] == 1
    assert out.loc["B", "drifted"] == 1
    assert out.loc["C", "drifted"] == 1
    assert out.loc["D", "drifted"] == 0
    assert out.loc["C", "total_chars"] == 2000
