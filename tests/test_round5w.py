"""Wave-49 tests: padding-waste batch math and integer MRR semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_padding_waste_batch_boundaries(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave49 import q_padding_waste

    rows = []
    # 33 one-token docs + 1 three-token doc: sorted batching puts the
    # 3-token doc in the second batch with one 1-token doc -> pad 2
    for i in range(33):
        rows.append({"doc_id": i, "source": "A", "text": "x"})
    rows.append({"doc_id": 99, "source": "A", "text": "x y z"})
    rows.append({"doc_id": 200, "source": "B", "text": "a b"})
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    out = q_padding_waste(str(tmp_path)).set_index("source")
    assert out.loc["A", "n_batches"] == 2
    assert out.loc["A", "pad_tokens"] == 2
    assert out.loc["A", "total_tokens"] == 36
    assert out.loc["B", "n_batches"] == 1
    assert out.loc["B", "pad_tokens"] == 0
    assert out.loc["B", "total_tokens"] == 2


def test_mrr_eval_rank_one_and_miss(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave49 import q_mrr_eval

    # v0 ~ v1 (label 0, mutual 1-NN -> rank-1 hits); v2 orthogonal with
    # label 1 and only label-0 candidates -> no hit, score 0
    vecs = [[10.0, 0.0], [9.0, 0.0], [0.0, 10.0]]
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0, 0, 1], pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = q_mrr_eval(str(tmp_path)).set_index("label")
    assert out.loc[0, "n_queries"] == 2
    assert out.loc[0, "sum_mrr_scaled"] == 2 * 2520
    assert out.loc[1, "n_queries"] == 1
    assert out.loc[1, "sum_mrr_scaled"] == 0
