"""Wave-54 tests: id-stable vocabulary evolution and integer PPMI."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _docs(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_vocab_evolve_keeps_old_ids_and_appends(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave54 import q_vocab_evolve

    # run-1 corpus (even doc_ids): 'b' x3, 'a' x2 -> old ids b=1, a=2.
    # full corpus adds odd docs with 'z' x5 and 'c' x1: evolved vocab
    # must keep b=1, a=2 despite 'z' now outranking both, and append
    # z, c after the old max (here old vocab size is 2 < top-20 cap).
    sf = _docs(
        tmp_path,
        [
            (0, "b b a"),
            (2, "b a"),
            (1, "z z z z z"),
            (3, "z c"),
        ],
    )
    out = q_vocab_evolve(sf).set_index("token")
    assert out.loc["b", "token_id"] == 1
    assert out.loc["a", "token_id"] == 2
    # new tokens rank by full count after the ACTUAL old max id (the
    # run-1 vocab is smaller than the top-20 cap here)
    assert out.loc["z", "token_id"] == 3
    assert out.loc["c", "token_id"] == 4
    assert out.loc["z", "cnt"] == 6  # 5 in doc 1 + 1 in doc 3
    assert out.loc["b", "cnt"] == 3


def test_ppmi_ranks_exclusive_pairs_over_frequent(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave54 import q_ppmi_pairs

    # "x y" occurs 3x and x,y occur ONLY together -> high PPMI.
    # "the a" occurs 3x but 'the' and 'a' are everywhere -> low PPMI.
    sf = _docs(
        tmp_path,
        [
            (1, "x y x y x y"),
            (2, "the a the a the a the the the a a a"),
        ],
    )
    out = q_ppmi_pairs(sf)
    assert out.iloc[0]["w1"] == "x" and out.iloc[0]["w2"] == "y"
    top = out.set_index(["w1", "w2"])["score_e3"]
    assert top.loc[("x", "y")] > top.loc[("the", "a")]
    # exact integer check: x=3 y=3 xy=3 (the trailing y of each "x y"
    # pair), total tokens = 18 -> 3*18*1000 // 9 = 6000
    assert top.loc[("x", "y")] == 3 * 18 * 1000 // 9
