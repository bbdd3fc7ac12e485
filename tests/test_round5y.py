"""Wave-51 tests: distributed run-length merge vs a brute-force islands
reference, and phrase statistics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_shuffle_run_audit_matches_bruteforce(ray_session, tmp_path):
    from pynomaly_ray.functions.hashing import knuth32
    from pynomaly_ray.pipelines.queries_wave51 import q_shuffle_run_audit

    # 3000 docs over 4 sources: enough rows that the sorted stream spans
    # many map_batches slices, exercising the cross-slice run stitching
    n = 3000
    doc_id = np.arange(n, dtype=np.int64)
    source = np.array(["s%d" % (i % 4) for i in range(n)], dtype=object)
    df = pd.DataFrame({"doc_id": doc_id, "source": source})
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    out = q_shuffle_run_audit(str(tmp_path)).set_index("source")

    # brute-force reference: order by (shuffle key, doc_id), then RLE
    sk = knuth32(doc_id, seed=17)
    order = np.lexsort((doc_id, sk))
    s = source[order]
    change = np.r_[True, s[1:] != s[:-1]]
    starts = np.nonzero(change)[0]
    lens = np.diff(np.r_[starts, n])
    ref = (
        pd.DataFrame({"source": s[starts], "run": lens})
        .groupby("source")["run"]
        .agg(n_runs="size", longest_run="max", n_docs="sum")
    )
    for src in ref.index:
        assert out.loc[src, "n_runs"] == ref.loc[src, "n_runs"]
        assert out.loc[src, "longest_run"] == ref.loc[src, "longest_run"]
        assert out.loc[src, "n_docs"] == ref.loc[src, "n_docs"]
    assert int(out["n_docs"].sum()) == n


def test_shuffle_run_audit_single_source(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave51 import q_shuffle_run_audit

    df = pd.DataFrame(
        {
            "doc_id": np.arange(50, dtype=np.int64),
            "source": ["only"] * 50,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    out = q_shuffle_run_audit(str(tmp_path))
    # one source -> every slice's runs merge into ONE global run
    assert out["source"].tolist() == ["only"]
    assert out["n_runs"].tolist() == [1]
    assert out["longest_run"].tolist() == [50]
    assert out["n_docs"].tolist() == [50]


def test_phrase_stats_counts(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave51 import q_phrase_stats

    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [
                "a b a b",  # "a b" x2, "b a" x1
                "a b c",  # "a b" x1, "b c" x1
                "z z",  # "z z" x1
            ],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    out = q_phrase_stats(str(tmp_path))
    assert out["bigram"].tolist() == ["a b", "b a", "b c"]
    assert out["n_occ"].tolist() == [3, 1, 1]
    assert out["n_docs"].tolist() == [2, 1, 1]
