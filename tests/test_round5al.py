"""Wave-63 tests: per-edge common-neighbor features vs brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_common_neighbors_matches_bruteforce(ray_session, tmp_path):
    from pynomaly_ray.functions.hashing import knuth32
    from pynomaly_ray.pipelines.queries_wave63 import q_common_neighbors

    rng = np.random.RandomState(5)
    n = 150
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": rng.randint(0, 40, size=n).astype(np.int64),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "orders.parquet"),
    )
    out = q_common_neighbors(str(tmp_path))

    m = max(n // 15, 10)
    hu = knuth32(df["o_orderkey"].to_numpy(), 1) % m
    hv = knuth32(df["o_custkey"].to_numpy(), 2) % m
    u, v = np.minimum(hu, hv), np.maximum(hu, hv)
    edges = {(a, b) for a, b in zip(u, v) if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    assert len(out) == len(edges)
    for r in out.itertuples():
        assert (r.u, r.v) in edges
        assert r.common == len(adj[r.u] & adj[r.v])
        assert r.deg_u == len(adj[r.u])
        assert r.deg_v == len(adj[r.v])
    # dense 10-node hash graph: at least one edge has a shared neighbor
    assert out["common"].max() > 0
