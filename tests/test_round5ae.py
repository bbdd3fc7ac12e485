"""Wave-57 tests: step-function integration and vocab growth curve."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_time_weighted_value_integrates_steps(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave57 import q_time_weighted_value

    base = pd.Timestamp("2024-01-01")
    specs = [
        # user 1: value 2.00 held 10s, then 4.00 held 5s, then last
        # event (holds 0s by definition)
        (0, 0, 1, 2.00),
        (1, 10, 1, 4.00),
        (2, 15, 1, 1.00),
        # user 2: single event -> zero duration
        (3, 0, 2, 9.99),
    ]
    df = pd.DataFrame(
        [
            {
                "event_id": eid,
                "ts": base + pd.Timedelta(seconds=s),
                "user_id": uid,
                "event_type": "a",
                "value": v,
                "props": "{}",
            }
            for eid, s, uid, v in specs
        ]
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_time_weighted_value(str(tmp_path)).set_index("user_id")
    assert out.loc[1, "num_cents_s"] == 200 * 10 + 400 * 5
    assert out.loc[1, "dur_s"] == 15
    assert out.loc[1, "n_events"] == 3
    assert out.loc[2, "num_cents_s"] == 0
    assert out.loc[2, "dur_s"] == 0


def test_vocab_growth_monotone_and_exact(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave57 import q_vocab_growth

    # doc ids 0..9 -> cutoffs 1..10; doc d introduces token "t<d//3>"
    # and always repeats token "x"
    rows = [
        {"doc_id": d, "text": f"x t{d // 3}"}
        for d in range(10)
    ]
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    out = q_vocab_growth(str(tmp_path))
    assert out["cutoff"].tolist() == list(range(1, 11))
    # prefix of d docs has 2*d tokens and 1 + ceil(d/3) distinct
    assert out["n_tokens"].tolist() == [2 * d for d in range(1, 11)]
    expect_distinct = [1 + ((d + 2) // 3) for d in range(1, 11)]
    assert out["n_distinct"].tolist() == expect_distinct
    assert (np.diff(out["n_distinct"]) >= 0).all()
