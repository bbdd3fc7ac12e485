"""Wave-58 tests: checksum sensitivity and session path assembly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _orders(tmp_path, rows):
    tmp_path.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey"])
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "orders.parquet"),
    )
    return str(tmp_path)


def test_table_checksum_order_insensitive_dup_sensitive(
    ray_session, tmp_path
):
    from pynomaly_ray.pipelines.queries_wave58 import q_table_checksum

    a = q_table_checksum(_orders(tmp_path / "a", [(1, 10), (2, 20)]))
    b = q_table_checksum(_orders(tmp_path / "b", [(2, 20), (1, 10)]))
    c = q_table_checksum(
        _orders(tmp_path / "c", [(1, 10), (2, 20), (2, 20)])
    )
    d = q_table_checksum(_orders(tmp_path / "d", [(1, 10), (2, 21)]))
    assert a["checksum"].iloc[0] == b["checksum"].iloc[0]  # order-free
    assert a["checksum"].iloc[0] != c["checksum"].iloc[0]  # dup-sensitive
    assert a["checksum"].iloc[0] != d["checksum"].iloc[0]  # value-sensitive
    assert c["n_rows"].iloc[0] == 3


def test_session_paths_split_cap_and_rank(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave58 import q_session_paths

    base = pd.Timestamp("2024-01-01")
    specs = []
    # user 1, session 1: a>b ; gap 31 min ; session 2: a>b (same path)
    specs += [(0, 0, 1, "a"), (1, 1, 1, "b")]
    specs += [(2, 32, 1, "a"), (3, 33, 1, "b")]
    # user 2: one 10-event session -> path capped at first 8 types
    specs += [(10 + i, i, 2, f"t{i}") for i in range(10)]
    df = pd.DataFrame(
        [
            {
                "event_id": eid,
                "ts": base + pd.Timedelta(minutes=m),
                "user_id": uid,
                "event_type": et,
                "value": 1.0,
                "props": "{}",
            }
            for eid, m, uid, et in specs
        ]
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_session_paths(str(tmp_path))
    assert out.iloc[0]["path"] == "a>b" and out.iloc[0]["cnt"] == 2
    capped = out[out["path"].str.startswith("t0")]
    assert capped["path"].iloc[0] == ">".join(f"t{i}" for i in range(8))
