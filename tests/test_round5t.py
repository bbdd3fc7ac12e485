"""Wave-46 tests: debounce window semantics, banded self-join counts,
1-NN label agreement with deterministic tie-breaks, greedy max-coverage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _events(tmp_path, specs):
    """specs: (event_id, minutes, user_id, event_type)."""
    base = pd.Timestamp("2024-01-01")
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
        t.schema.get_field_index("ts"),
        "ts",
        t["ts"].cast(pa.timestamp("us")),
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_event_debounce_window_semantics(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave46 import q_event_debounce

    # user 1 type a: 0, +10m (sup), +15m (sup: gap == window, inclusive),
    # +16m (kept).  user 2 type a: lone event (kept).  user 1 type b:
    # two events 20m apart (both kept) — keys are independent.
    sf = _events(
        tmp_path,
        [
            (0, 0, 1, "a"),
            (1, 10, 1, "a"),
            (2, 25, 1, "a"),
            (3, 41, 1, "a"),
            (4, 0, 2, "a"),
            (5, 0, 1, "b"),
            (6, 20, 1, "b"),
        ],
    )
    out = q_event_debounce(sf).set_index("event_type")
    assert out.loc["a", "kept"] == 3  # first, 41m, lone user-2 event
    assert out.loc["a", "suppressed"] == 2
    assert out.loc["b", "kept"] == 2
    assert out.loc["b", "suppressed"] == 0


def test_order_bursts_band_and_filter(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave46 import q_order_bursts

    base = pd.Timestamp("1995-01-01")
    rows = []
    # cust 1: days 0, 15, 30, 100 -> in-band pairs (0,15) (0,30) (15,30)
    for i, d in enumerate([0, 15, 30, 100]):
        rows.append((i, 1, base + pd.Timedelta(days=d)))
    # cust 2: days 0, 31 -> no pair, must be absent from output
    rows.append((10, 2, base))
    rows.append((11, 2, base + pd.Timedelta(days=31)))
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey", "o_orderdate"])
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("o_orderdate"),
        "o_orderdate",
        t["o_orderdate"].cast(pa.timestamp("us")),
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = q_order_bursts(str(tmp_path))
    assert out["o_custkey"].tolist() == [1]
    assert out["burst_pairs"].tolist() == [3]


def _embeddings(tmp_path, vecs, labels):
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.asarray(labels, dtype=np.int32),
        }
    )
    t = pa.table(
        {
            "vec_id": pa.array(df["vec_id"], pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in df["embedding"]],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(df["label"], pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_knn_accuracy_planted_clusters(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave46 import q_knn_accuracy

    d = 8
    a = np.zeros(d)
    a[0] = 1.0
    b = np.zeros(d)
    b[1] = 1.0
    # two tight clusters with matching labels: every vector's 1-NN is
    # its twin, so agreement is total
    sf = _embeddings(
        tmp_path,
        [a, a * 0.9, b, b * 0.9],
        [0, 0, 1, 1],
    )
    out = q_knn_accuracy(sf).set_index("label")
    assert out.loc[0, "n_vecs"] == 2 and out.loc[0, "n_agree"] == 2
    assert out.loc[1, "n_vecs"] == 2 and out.loc[1, "n_agree"] == 2


def test_knn_accuracy_tie_breaks_to_smallest_id(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave46 import q_knn_accuracy

    v = np.ones(4)
    # three identical vectors: every dot ties, so each vector's 1-NN is
    # the smallest OTHER vec_id: nn(0)=1, nn(1)=0, nn(2)=0
    sf = _embeddings(tmp_path, [v, v, v], [0, 0, 1])
    out = q_knn_accuracy(sf).set_index("label")
    assert out.loc[0, "n_agree"] == 2  # 0<->1 agree
    assert out.loc[1, "n_agree"] == 0  # vec 2's NN is vec 0 (label 0)


def test_coverage_select_greedy_and_ties(ray_session, tmp_path):
    from pynomaly_ray.pipelines.queries_wave46 import q_coverage_select

    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
            "text": [
                "a b c d",  # bigrams {a b, b c, c d} -> gain 3
                "a b x",  # {a b, b x} -> marginal 1 after doc 1
                "p q",  # {p q} -> marginal 1; tie with doc 2 -> doc 2 first
                "a b",  # fully covered -> gain 0, still selectable last
            ],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    out = q_coverage_select(str(tmp_path))
    assert out["step"].tolist() == [1, 2, 3, 4]
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    assert out["gain"].tolist() == [3, 1, 1, 0]
