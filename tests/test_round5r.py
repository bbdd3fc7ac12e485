"""Wave-44 tests: DSIR importance weighting semantics on a crafted corpus."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dsir_scores_target_like_docs_higher(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave44 import q_dsir_weights

    # target domain src0 speaks 'alpha beta'; src1 speaks 'gamma delta'.
    rows = [
        {"doc_id": 0, "source": "src0", "text": "alpha beta alpha"},
        {"doc_id": 1, "source": "src0", "text": "beta beta"},
        {"doc_id": 2, "source": "src1", "text": "gamma delta gamma"},
        # doc 3 is from src1 but written in the target's language —
        # DSIR must rank it above doc 2 despite its source label
        {"doc_id": 3, "source": "src1", "text": "alpha beta"},
        {"doc_id": 4, "source": "src1", "text": ""},
    ]
    sf = _write_docs(tmp_path, rows)
    out = q_dsir_weights(sf).set_index("doc_id")["dsir_score"]
    # alpha: 2 target / 3 corpus; beta: 3/4; gamma,delta: 0/N
    a = 2 * 1_000_000 // 3
    b = 3 * 1_000_000 // 4
    assert out[0] == 2 * a + b
    assert out[1] == 2 * b
    assert out[2] == 0
    assert out[3] == a + b
    assert out[4] == 0
    assert out[3] > out[2]


def test_dsir_empty_target_all_zero(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave44 import q_dsir_weights

    rows = [
        {"doc_id": i, "source": "srcX", "text": "foo bar baz"}
        for i in range(6)
    ]
    sf = _write_docs(tmp_path, rows)
    out = q_dsir_weights(sf)
    assert (out["dsir_score"] == 0).all()
    assert len(out) == 6


def test_dsir_profile_cutoff_is_deterministic(ray_session, tmp_path):
    """With V words tied on corpus count the cutoff picks word-ASC."""
    from pynomaly_ray.pipelines import queries_wave44 as w

    old_v = w._PROFILE_V
    w._PROFILE_V = 2
    try:
        rows = [
            {"doc_id": 0, "source": "src0", "text": "aa bb cc"},
            {"doc_id": 1, "source": "src1", "text": "aa bb cc"},
        ]
        sf = _write_docs(tmp_path, rows)
        prof = w._profile(sf)
        # all three words have corpus_cnt 2; top-2 by word ASC = aa, bb
        assert set(prof) == {"aa", "bb"}
        assert all(v == 1_000_000 // 2 for v in prof.values())
    finally:
        w._PROFILE_V = old_v
