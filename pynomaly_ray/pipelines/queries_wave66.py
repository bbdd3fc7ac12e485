"""Wave-66: metadata-only statistics from the sorted layout.

``layout_stats_orders`` — COUNT(*) / MIN(key) / MAX(key) answered from
the zone manifest ALONE (``sources.sorted_layout.layout_stats``), the
Iceberg/Delta stats-only fast path: at 100 TB a row count or key range
should cost one manifest read, not a scan.  The query PROVES the
metadata-only property in-line: every data file is renamed away before
``layout_stats`` runs and restored afterwards — if the stats path
touched any parquet, the query would crash, not just mismatch.  The
DuckDB twin recomputes the same three numbers from the raw table, so
the hash match certifies that write_sorted's zone bounds and row
counts are exact, not merely self-consistent.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq


def q_layout_stats_orders(sf_dir: str):
    import shutil
    import tempfile

    from pynomaly_ray.sources.sorted_layout import (
        layout_stats,
        load_manifest,
        write_sorted,
    )

    root = tempfile.mkdtemp(prefix="pnr-lstats-", dir="/tmp")
    try:
        orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        lay = os.path.join(root, "orders_by_key")
        write_sorted(orders, "o_orderkey", lay, num_partitions=6)

        # hide every data file: stats MUST come from the manifest only
        m = load_manifest(lay)
        hidden = []
        for z in m["zones"]:
            fp = os.path.join(lay, z["file"])
            os.rename(fp, fp + ".hidden")
            hidden.append(fp)
        try:
            stats = layout_stats(lay)
        finally:
            for fp in hidden:
                os.rename(fp + ".hidden", fp)

        if stats["key_nulls"] != 0:
            raise AssertionError("o_orderkey must have no nulls")
        return pd.DataFrame(
            {
                "n_rows": np.array([stats["rows"]], dtype=np.int64),
                "key_min": np.array([stats["key_min"]], dtype=np.int64),
                "key_max": np.array([stats["key_max"]], dtype=np.int64),
            }
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_LAYOUT_STATS_ORDERS = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(o_orderkey) AS BIGINT) AS key_min,
       CAST(MAX(o_orderkey) AS BIGINT) AS key_max
FROM orders
"""


ORACLE_QUERIES["layout_stats_orders"] = (
    q_layout_stats_orders,
    SQL_LAYOUT_STATS_ORDERS,
)
