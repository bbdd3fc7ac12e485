"""Wave-28: incrementally-maintained materialized aggregate view
certified through the oracle.

``matview_source_stats`` — a per-source (n_docs, sum_chars, min_chars,
max_chars) view over documents is created from a BASE slice (doc_id %
5 != 0), then refreshed with the remaining DELTA slice
(:mod:`pynomaly_ray.state.matview`), and the refreshed state is read
back.  The oracle is the plain full-table SQL aggregate: the incremental
identity ``merge(state, partial(delta)) == agg(base ∪ delta)`` is what
the hash comparison certifies.  The in-query re-refresh with the SAME
run id asserts the exactly-once contract (a re-delivered increment is
a committed no-op, never a double count) — the property that makes the
view trustworthy under crash-retry at 100 TB.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq


def q_matview_source_stats(sf_dir: str):
    import shutil
    import tempfile

    from pynomaly_ray.state.matview import (
        create_matview,
        read_matview,
        refresh_matview,
    )

    docs = _pq(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def split(keep_delta: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            is_delta = (ids % 5) == 0
            return t.filter(pa.array(is_delta if keep_delta else ~is_delta))

        return f

    base = docs.map_batches(split(False), batch_format="pyarrow")
    delta = docs.map_batches(split(True), batch_format="pyarrow")

    spec = {
        "n_docs": (None, "count"),
        "sum_chars": ("n_chars", "sum"),
        "min_chars": ("n_chars", "min"),
        "max_chars": ("n_chars", "max"),
    }
    root = tempfile.mkdtemp(prefix="pnr-matview-", dir="/tmp")
    try:
        path = os.path.join(root, "by_source")
        create_matview(path, base, ["source"], spec, run_id="base")
        m1 = refresh_matview(path, delta, run_id="delta-1")
        # exactly-once: re-delivering the same increment must be a
        # committed no-op — certified INSIDE the oracle query
        m2 = refresh_matview(path, delta, run_id="delta-1")
        if m2["gen"] != m1["gen"] or m2["rows"] != m1["rows"]:
            raise AssertionError(
                "re-delivered run id changed the view state "
                f"(gen {m1['gen']}->{m2['gen']})"
            )
        df = read_matview(path).to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    if df.empty or "source" not in df.columns:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_docs": pd.Series(dtype=np.int64),
                "sum_chars": pd.Series(dtype=np.int64),
                "min_chars": pd.Series(dtype=np.int64),
                "max_chars": pd.Series(dtype=np.int64),
            }
        )
    for c in ("n_docs", "sum_chars", "min_chars", "max_chars"):
        df[c] = df[c].astype(np.int64)
    return (
        df[["source", "n_docs", "sum_chars", "min_chars", "max_chars"]]
        .sort_values("source", kind="mergesort")
        .reset_index(drop=True)
    )


SQL_MATVIEW_SOURCE_STATS = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY source
ORDER BY source
"""

ORACLE_QUERIES["matview_source_stats"] = (
    q_matview_source_stats,
    SQL_MATVIEW_SOURCE_STATS,
)
