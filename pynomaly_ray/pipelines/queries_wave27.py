"""Wave-27: Z-order clustered layout certified through the oracle.

``zorder_rect_orders`` — orders Morton-clustered on
(o_custkey, o_orderdate) (:mod:`pynomaly_ray.sources.zorder_layout`),
then a rectangle predicate (customer range AND one year) is served by
opening ONLY the files whose per-file bounding box intersects the
rectangle.  The in-query assertions certify the layout, not just the
arithmetic: the rectangle plan must prune files, and — the reason
z-order exists — a SECOND-dimension-only plan must also prune, which a
1-D sort on the first key can never do.  The residual filter keeps
pruning an I/O-only optimization, so the aggregate is exactly the SQL
rectangle aggregate.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted, hash_aggregate
from pynomaly_ray.pipelines.queries import (
    ORACLE_QUERIES,
    _cents,
    _pq,
    _typed_empty,
)

_CK_LO, _CK_HI = 100, 400
_DT_LO, _DT_HI = "1996-01-01", "1996-12-31 23:59:59.999999"


def q_zorder_rect_orders(sf_dir: str):
    import shutil
    import tempfile

    from pynomaly_ray.sources.zorder_layout import (
        write_zorder,
        zorder_plan,
        zorder_scan,
    )

    root = tempfile.mkdtemp(prefix="pnr-zorder-", dir="/tmp")
    try:
        orders = _pq(
            sf_dir,
            "orders",
            ["o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice"],
        )
        lay = os.path.join(root, "orders_zorder")
        write_zorder(
            orders, ["o_custkey", "o_orderdate"], lay, num_partitions=16
        )

        r1 = (_CK_LO, _CK_HI)
        r2 = (pd.Timestamp(_DT_LO), pd.Timestamp(_DT_HI))
        total = len(zorder_plan(lay))
        rect = len(zorder_plan(lay, r1, r2))
        dim2_only = len(zorder_plan(lay, (None, None), r2))
        if total >= 8 and not (rect < total and dim2_only < total):
            # pruning is the point: the rectangle AND the second
            # dimension alone must both skip files (a 1-D layout on
            # custkey could never do the latter)
            raise AssertionError(
                f"z-order pruning ineffective: rect {rect}/{total}, "
                f"dim2-only {dim2_only}/{total}"
            )
        scanned = zorder_scan(lay, r1, r2)

        def pre(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            g = (
                df.assign(cents=_cents(df["o_totalprice"].to_numpy()))
                .groupby("o_orderpriority", sort=False)
                .agg(n_orders=("cents", "size"), sum_cents=("cents", "sum"))
                .reset_index()
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        out = hash_aggregate(
            scanned.map_batches(pre, batch_format="pyarrow"),
            ["o_orderpriority"],
            lambda df: df.groupby("o_orderpriority", sort=False)
            .sum()
            .reset_index(),
        )
        df = out.to_pandas()
        if not len(df) or "o_orderpriority" not in df.columns:
            return _typed_empty(["o_orderpriority", "n_orders", "sum_cents"])
        df["n_orders"] = df["n_orders"].astype(np.int64)
        df["sum_cents"] = df["sum_cents"].astype(np.int64)
        return collect_sorted(df, ["o_orderpriority"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_ZORDER_RECT_ORDERS = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM orders
WHERE o_custkey BETWEEN {_CK_LO} AND {_CK_HI}
  AND o_orderdate >= TIMESTAMP '{_DT_LO}'
  AND o_orderdate <= TIMESTAMP '{_DT_HI}'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLE_QUERIES["zorder_rect_orders"] = (
    q_zorder_rect_orders,
    SQL_ZORDER_RECT_ORDERS,
)
