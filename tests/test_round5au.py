"""Wave-72 tests: persisted IVF vector index (write / plan / search)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _toy_corpus(n=400, d=8, k=4, seed=7):
    """k well-separated gaussian blobs -> (ids, vectors)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 10.0
    X = np.concatenate(
        [centers[i] + rng.normal(scale=0.3, size=(n // k, d)) for i in range(k)]
    )
    ids = np.arange(len(X), dtype=np.int64)
    return ids, X


def _write_index(ray, tmp_path, ids, X, k=4):
    from pynomaly_ray.sources.ivf_index import write_ivf_index

    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array(
                    [list(map(float, row)) for row in X], pa.list_(pa.float64())
                ),
            }
        )
    )
    path = str(tmp_path / "ivf")
    manifest = write_ivf_index(emb, path, k=k, n_iter=4)
    return path, manifest


def _brute_topk(X, ids, q, topk):
    qn = q / np.linalg.norm(q)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    e6 = np.floor(Xn @ qn * 1e6 + 0.5).astype(np.int64)
    order = np.lexsort((ids, -e6))[:topk]
    return list(zip(ids[order], e6[order]))


def test_ivf_write_plan_search_exact_within_probe(ray_session, tmp_path):
    ids, X = _toy_corpus()
    path, manifest = _write_index(ray_session, tmp_path, ids, X, k=4)
    assert manifest["rows"] == len(ids)
    assert manifest["k"] == 4

    from pynomaly_ray.sources.ivf_index import ivf_probe_plan, ivf_search

    # query a corpus point: its own blob's cluster is probed first, and
    # with well-separated blobs nprobe=1 already finds the exact top-k
    q = X[5]
    plan = ivf_probe_plan(path, q, nprobe=1)
    assert plan.shape == (1, 1)
    out = ivf_search(path, q, nprobe=1, topk=5)
    expect = _brute_topk(X, ids, q, 5)
    got = list(zip(out["vec_id"].to_numpy(), out["score_e6"].to_numpy()))
    assert got == expect

    # nprobe == k is exact brute force for ANY query
    rng = np.random.default_rng(1)
    q2 = rng.normal(size=X.shape[1])
    out2 = ivf_search(path, q2, nprobe=4, topk=7)
    assert list(
        zip(out2["vec_id"].to_numpy(), out2["score_e6"].to_numpy())
    ) == _brute_topk(X, ids, q2, 7)


def test_ivf_search_prunes_partitions(ray_session, tmp_path):
    ids, X = _toy_corpus()
    path, _ = _write_index(ray_session, tmp_path, ids, X, k=4)
    from pynomaly_ray.sources.ivf_index import ivf_probe_plan

    # all queries from ONE blob -> the nprobe=1 plan touches one cluster
    plan = ivf_probe_plan(path, X[[0, 10, 20, 30]], nprobe=1)
    assert len({int(c) for row in plan for c in row}) == 1


def test_ivf_uncommitted_index_refuses_to_serve(ray_session, tmp_path):
    ids, X = _toy_corpus(n=80)
    path, _ = _write_index(ray_session, tmp_path, ids, X, k=2)
    os.remove(os.path.join(path, "_ivf.json"))  # simulate crash pre-commit
    from pynomaly_ray.sources.ivf_index import ivf_search

    with pytest.raises(FileNotFoundError, match="commit marker"):
        ivf_search(path, X[0], nprobe=1, topk=3)


def test_ivf_empty_probe_returns_typed_empty(ray_session, tmp_path):
    ids, X = _toy_corpus(n=80)
    path, _ = _write_index(ray_session, tmp_path, ids, X, k=2)
    # remove every cluster dir -> probed dirs all absent -> typed empty
    import shutil

    shutil.rmtree(os.path.join(path, "clusters"))
    from pynomaly_ray.sources.ivf_index import ivf_search

    out = ivf_search(path, X[0], nprobe=1, topk=3)
    assert out.empty
    assert list(out.columns) == ["query_id", "vec_id", "score_e6"]
    assert all(out[c].dtype == np.int64 for c in out.columns)


def test_ivf_query_dim_mismatch(ray_session, tmp_path):
    ids, X = _toy_corpus(n=80, d=8)
    path, _ = _write_index(ray_session, tmp_path, ids, X, k=2)
    from pynomaly_ray.sources.ivf_index import ivf_probe_plan

    with pytest.raises(ValueError, match="dim"):
        ivf_probe_plan(path, np.zeros((1, 5)), nprobe=1)


def test_ivf_recall_eval_query_bounds(ray_session):
    from pynomaly_ray.pipelines.queries_wave72 import q_ivf_recall_eval

    out = q_ivf_recall_eval("/root/testdata/sf0.001")
    assert list(out.columns) == ["query_id", "hits_at_10"]
    assert len(out) == 8
    assert out["hits_at_10"].between(0, 10).all()
    # the probed cluster contains the query point itself, whose cosine
    # with itself is exactly 1.0 — so every query scores at least 1 hit
    assert (out["hits_at_10"] >= 1).all()
