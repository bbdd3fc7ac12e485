"""Wave-48 tests: span corruption string exactness and edge windows,
deterministic source interleave order."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _docs(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_span_corrupt_exact_strings(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave48 import q_span_corrupt

    # doc 5: window w masked iff (15 + 7w) % 100 < 20 -> w=0 masked.
    # 7 tokens: idx1 -> sentinel, idx2 dropped, window 1 untouched.
    # doc 22 (22 % 17 == 5): w=0 gives 66 -> unmasked, text unchanged.
    # doc 39: 2 tokens, masked window but no idx2 to drop.
    # doc 56: 1 token, masked window but no idx1 -> no sentinel at all.
    # doc 3: not in the % 17 == 5 sample -> absent.
    sf = _docs(
        tmp_path,
        [
            (5, "t0 t1 t2 t3 t4 t5 t6", "s"),
            (22, "a b c", "s"),
            (39, "a b", "s"),
            (56, "a", "s"),
            (3, "x y z", "s"),
        ],
    )
    out = q_span_corrupt(sf).set_index("doc_id")
    assert out.loc[5, "corrupted"] == "t0 <extra_id_0> t3 t4 t5 t6"
    assert out.loc[5, "n_spans"] == 1
    assert out.loc[22, "corrupted"] == "a b c"
    assert out.loc[22, "n_spans"] == 0
    w39 = (39 * 1_000_003) % 100 < 20
    if w39:
        assert out.loc[39, "corrupted"] == "a <extra_id_0>"
        assert out.loc[39, "n_spans"] == 1
    else:
        assert out.loc[39, "corrupted"] == "a b"
    w56 = (56 * 1_000_003) % 100 < 20
    assert out.loc[56, "corrupted"] == "a"
    assert out.loc[56, "n_spans"] == 0 if w56 else True
    assert 3 not in out.index


def test_span_corrupt_multiple_sentinels_ordered(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave48 import q_span_corrupt

    # doc 5: masked windows are w = 0 and w = 13 ((15+7w)%100 < 20).
    # 70 tokens cover windows 0..13: sentinel k increments in doc order.
    toks = [f"w{i}" for i in range(70)]
    sf = _docs(tmp_path, [(5, " ".join(toks), "s")])
    out = q_span_corrupt(sf)
    corrupted = out["corrupted"].iloc[0].split(" ")
    assert out["n_spans"].iloc[0] == 2
    assert "<extra_id_0>" in corrupted and "<extra_id_1>" in corrupted
    assert corrupted.index("<extra_id_0>") < corrupted.index("<extra_id_1>")
    # window 13 spans idx 65..69: idx 66 replaced, idx 67 dropped
    assert "w66" not in corrupted and "w67" not in corrupted
    assert "w65" in corrupted and "w68" in corrupted


def test_interleave_sources_round_robin(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave48 import q_interleave_sources

    sf = _docs(
        tmp_path,
        [
            (1, "x", "A"),
            (3, "x", "A"),
            (2, "x", "B"),
        ],
    )
    out = q_interleave_sources(sf)
    assert out["ord"].tolist() == [0, 1, 2]
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["source"].tolist() == ["A", "B", "A"]
