"""Wave-56 tests: data-test violation counting and triple mining."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_data_tests_counts_each_violation_kind(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave56 import q_data_tests

    orders = pd.DataFrame(
        {
            # duplicate key 1 (x3 -> 2 extra rows), bad status 'X',
            # null custkey, and custkey 99 missing from customer
            "o_orderkey": np.array([1, 1, 1, 2, 3, 4], dtype=np.int64),
            "o_custkey": pd.array([10, 10, 10, None, 99, 10], dtype="Int64"),
            "o_orderstatus": ["O", "F", "P", "X", "O", "O"],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(orders, preserve_index=False),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([10], pa.int64())}),
        str(tmp_path / "customer.parquet"),
    )
    out = q_data_tests(str(tmp_path)).set_index("test_name")
    assert out.loc["unique_o_orderkey", "n_violations"] == 2
    assert out.loc["not_null_o_custkey", "n_violations"] == 1
    assert out.loc["accepted_values_o_orderstatus", "n_violations"] == 1
    assert out.loc["relationship_o_custkey", "n_violations"] == 1


def test_basket_triples_canonical_and_counts(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave56 import q_basket_triples

    li = pd.DataFrame(
        {
            # order 1: parts {1,2,3} -> one triple (1,2,3)
            # order 2: parts {1,2,3,4} -> 4 triples incl (1,2,3)
            # order 3: parts {5,6} -> none
            "l_orderkey": np.array(
                [1, 1, 1, 2, 2, 2, 2, 3, 3], dtype=np.int64
            ),
            "l_partkey": np.array(
                [3, 1, 2, 1, 2, 3, 4, 5, 6], dtype=np.int64
            ),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(li, preserve_index=False),
        str(tmp_path / "lineitem.parquet"),
    )
    out = q_basket_triples(str(tmp_path))
    top = out.iloc[0]
    assert (top["p1"], top["p2"], top["p3"], top["cnt"]) == (1, 2, 3, 2)
    assert len(out) == 4  # (1,2,3) + the three other order-2 triples
    assert (out["cnt"].iloc[1:] == 1).all()
    assert (out["p1"] < out["p2"]).all() and (out["p2"] < out["p3"]).all()
