"""Wave-19 pipelines: storage-side point lookups and iterative graph
peeling.

- ``point_lookup_orders`` — certifies the sorted layout's Bloom
  sidecar path (:func:`sources.sorted_layout.point_lookup`): builds a
  zone-mapped layout over a derived SPARSE key (``o_orderkey * 2`` —
  every odd probe falls inside some file's zone range but inside no
  file), adds per-file Bloom sidecars, and asserts in-query that the
  planner opens files for present keys while pruning ALL files for
  the in-range-absent probes — the skipping zones alone cannot do.
  The SQL twin is a plain ``IN`` list over the base table.
- ``kcore_nodes`` — distributed k-core decomposition by
  iterative peeling: per-round degree exchange, then
  :func:`anti_membership` drops edges touching sub-threshold nodes on
  each endpoint.  Termination on a fixpoint (zero nodes dropped).
  Rows-only (unbounded iteration count has no SQL twin); exactness is
  pinned by a driver-peeling parity pytest.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    anti_membership,
    collect_sorted,
    hash_aggregate,
)
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _cents, _pq

# mixed probe set: evens exist (key2 = 2 * orderkey), odds are
# in-range absent at every scale factor; kept static so the SQL twin
# is a literal IN list
_POINT_PROBES = [
    4, 14, 206, 1000, 1998, 2604, 2998,  # present (even, < 2*1500)
    3, 777, 1001, 1999, 2605,            # absent (odd, in range)
]


def q_point_lookup_orders(sf_dir: str):
    import shutil
    import tempfile

    from pynomaly_ray.sources.sorted_layout import (
        add_blooms,
        point_lookup,
        point_plan,
        write_sorted,
    )

    root = tempfile.mkdtemp(prefix="pnr-bloom-", dir="/tmp")
    try:
        orders = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

        def derive(t: pa.Table) -> pa.Table:
            k2 = (
                t["o_orderkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                * 2
            )
            return pa.table(
                {
                    "key2": pa.array(k2),
                    "price_cents": pa.array(
                        _cents(
                            t["o_totalprice"].to_numpy(zero_copy_only=False)
                        )
                    ),
                }
            )

        lay = os.path.join(root, "orders_by_key2")
        write_sorted(
            orders.map_batches(derive, batch_format="pyarrow"),
            "key2",
            lay,
            num_partitions=8,
        )
        add_blooms(lay)

        evens = [p for p in _POINT_PROBES if p % 2 == 0]
        odds = [p for p in _POINT_PROBES if p % 2 == 1]
        # the certification teeth: absent-but-in-range probes must plan
        # ZERO files (zones alone cannot prune them — their ranges
        # cover the odds; the blooms must), present probes must plan
        # at least one
        if point_plan(lay, odds):
            raise AssertionError(
                "bloom sidecars failed to prune all in-range-absent probes"
            )
        if not point_plan(lay, evens):
            raise AssertionError("point plan lost present keys")

        out = point_lookup(lay, _POINT_PROBES).to_pandas()
        if out.empty or "key2" not in out.columns:
            return pd.DataFrame(
                {
                    "key2": pd.Series(dtype=np.int64),
                    "price_cents": pd.Series(dtype=np.int64),
                }
            )
        out["key2"] = out["key2"].astype(np.int64)
        out["price_cents"] = out["price_cents"].astype(np.int64)
        return out.sort_values("key2", kind="mergesort").reset_index(
            drop=True
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_POINT_LOOKUP_ORDERS = f"""
SELECT CAST(o_orderkey * 2 AS BIGINT) AS key2,
       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM orders
WHERE o_orderkey * 2 IN ({", ".join(str(p) for p in _POINT_PROBES)})
ORDER BY key2
"""

ORACLE_QUERIES["point_lookup_orders"] = (
    q_point_lookup_orders,
    SQL_POINT_LOOKUP_ORDERS,
)


# ---------------------------------------------------------------------------
# k-core by iterative peeling.
# ---------------------------------------------------------------------------
def _kcore_k(edges) -> int:
    """k at ~2/3 of the derived graph's mean degree: safely above
    trivial (k<=3 peels nothing at this density) and safely below the
    core-percolation threshold (k near the mean dissolves the whole
    graph), so the peel genuinely cascades AND a nontrivial core
    survives at every scale factor."""
    n_edges = edges.count()
    def ends(t: pa.Table) -> pa.Table:
        uu = t["u"].to_numpy(zero_copy_only=False)
        vv = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(np.concatenate([uu, vv])))})
    n_nodes = hash_aggregate(
        edges.map_batches(ends, batch_format="pyarrow"),
        ["node"],
        lambda df: df.drop_duplicates(["node"]),
    ).count()
    if n_nodes == 0:
        return 3
    return max(3, (2 * n_edges) // n_nodes * 2 // 3)


def derived_edges(sf_dir: str):
    """The shared derived order graph (same construction as
    triangle_count / pagerank): knuth32-hashed endpoints over a vertex
    domain scaling with the data, oriented u < v, distinct."""
    import pyarrow.parquet as papq

    from pynomaly_ray.functions.hashing import knuth32

    n_orders = papq.read_metadata(
        os.path.join(sf_dir, "orders.parquet")
    ).num_rows
    m = max(n_orders // 15, 10)
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def edges_of(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hu = knuth32(ok, 1) % m
        hv = knuth32(ck, 2) % m
        u = np.minimum(hu, hv)
        v = np.maximum(hu, hv)
        keep = u != v
        df = pd.DataFrame({"u": u[keep], "v": v[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return hash_aggregate(
        orders.map_batches(edges_of, batch_format="pyarrow"),
        ["u", "v"],
        lambda df: df.drop_duplicates(["u", "v"]),
    ).materialize()


def kcore_edges(edges, k: int, max_rounds: int = 64):
    """Peel ``edges`` (columns u, v; undirected, u < v) down to the
    k-core: rounds of degree-count -> drop sub-k nodes' edges until a
    fixpoint.  Per round: one degree exchange plus two anti-membership
    passes (broadcast under the cap, partitioned above) — no driver
    residency beyond the constant dropped-count check."""

    def deg_partial(t: pa.Table) -> pa.Table:
        uu = t["u"].to_numpy(zero_copy_only=False)
        vv = t["v"].to_numpy(zero_copy_only=False)
        nodes, cnt = np.unique(np.concatenate([uu, vv]), return_counts=True)
        return pa.table(
            {"node": pa.array(nodes), "d": pa.array(cnt.astype(np.int64))}
        )

    for _ in range(max_rounds):
        deg = hash_aggregate(
            edges.map_batches(deg_partial, batch_format="pyarrow"),
            ["node"],
            lambda df: df.groupby("node", sort=False)["d"]
            .sum()
            .reset_index(),
        ).materialize()

        def low_only(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.less(t["d"], pa.scalar(k, pa.int64())))
            return pa.table({"node": t["node"]})

        low = deg.map_batches(low_only, batch_format="pyarrow").materialize()
        if low.count() == 0:
            return edges

        def as_u(t: pa.Table) -> pa.Table:
            return pa.table({"u": t["node"]})

        def as_v(t: pa.Table) -> pa.Table:
            return pa.table({"v": t["node"]})

        edges = anti_membership(
            anti_membership(
                edges, low.map_batches(as_u, batch_format="pyarrow"), "u"
            ),
            low.map_batches(as_v, batch_format="pyarrow"),
            "v",
        ).materialize()
        if edges.count() == 0:
            return edges
    raise RuntimeError(f"k-core failed to converge in {max_rounds} rounds")


def q_kcore_nodes(sf_dir: str):
    """Nodes of the k-core of the derived order graph with their final
    in-core degree, sorted by node."""
    edges = derived_edges(sf_dir)
    edges = kcore_edges(edges, _kcore_k(edges))
    if edges.count() == 0:
        return pd.DataFrame(
            {
                "node": pd.Series(dtype=np.int64),
                "core_deg": pd.Series(dtype=np.int64),
            }
        )

    def deg_partial(t: pa.Table) -> pa.Table:
        uu = t["u"].to_numpy(zero_copy_only=False)
        vv = t["v"].to_numpy(zero_copy_only=False)
        nodes, cnt = np.unique(np.concatenate([uu, vv]), return_counts=True)
        return pa.table(
            {"node": pa.array(nodes), "core_deg": pa.array(cnt.astype(np.int64))}
        )

    deg = hash_aggregate(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        ["node"],
        lambda df: df.groupby("node", sort=False)["core_deg"]
        .sum()
        .reset_index(),
    )
    out = collect_sorted(deg, ["node"])
    out["node"] = out["node"].astype(np.int64)
    out["core_deg"] = out["core_deg"].astype(np.int64)
    return out[["node", "core_deg"]]
