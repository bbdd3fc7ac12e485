"""Wave-61 tests: per-vertex clustering-coefficient surface vs a
brute-force recompute of the same hash-derived graph."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_clustering_coeff_matches_bruteforce(ray_session, tmp_path):
    from pynomaly_ray.functions.hashing import knuth32
    from pynomaly_ray.pipelines.queries_wave61 import q_clustering_coeff

    rng = np.random.RandomState(11)
    n = 120
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": rng.randint(0, 30, size=n).astype(np.int64),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "orders.parquet"),
    )

    out = q_clustering_coeff(str(tmp_path))

    # brute-force the same derived graph (m = max(n//15, 10) = 10)
    m = max(n // 15, 10)
    hu = knuth32(df["o_orderkey"].to_numpy(), 1) % m
    hv = knuth32(df["o_custkey"].to_numpy(), 2) % m
    u, v = np.minimum(hu, hv), np.maximum(hu, hv)
    edges = {(a, b) for a, b in zip(u, v) if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {k: len(s) for k, s in adj.items()}
    tri = dict.fromkeys(adj, 0)
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1

    got = out.set_index("node")
    assert set(got.index) == set(adj)
    for node in adj:
        assert got.loc[node, "deg"] == deg[node]
        assert got.loc[node, "tri_cnt"] == tri[node]
    # a K-ish dense hash graph on 10 nodes must contain triangles
    assert out["tri_cnt"].sum() > 0
