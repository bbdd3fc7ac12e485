"""Wave-69: TPC-H Q6 (forecast revenue change) — pushdown + map-only.

``forecast_revenue`` — the last TPC-H shape expressible on this corpus
(Q6; Q12/Q20 need shipmode/partsupp columns the testdata lacks): a
pure predicate scan-and-sum with NO shuffle at all.  The shipdate
year-window is pushed INTO the parquet read as a dataset expression
(row groups outside the range never decode); discount and price snap
to their integer grids (bp / cents) so the revenue sum is exact int64
arithmetic with one partial row per block — the cheapest possible
distributed aggregate, and the shape that shows the engine's floor:
scan bandwidth, not framework overhead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads

from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq

_LO = pd.Timestamp("1996-01-01")
_HI = pd.Timestamp("1997-01-01")


def q_forecast_revenue(sf_dir: str):
    ds = _pq(
        sf_dir,
        "lineitem",
        ["l_shipdate", "l_discount", "l_extendedprice", "l_quantity"],
        filter=(
            (pads.field("l_shipdate") >= pa.scalar(_LO.to_pydatetime()))
            & (pads.field("l_shipdate") < pa.scalar(_HI.to_pydatetime()))
        ),
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_discount" not in t.schema.names:
            return pa.table({"rev_e4": pa.array([], pa.int64())})
        df = t.to_pandas()
        cents = np.floor(
            df["l_extendedprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        disc = np.floor(
            df["l_discount"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        qty = df["l_quantity"].to_numpy(np.float64)
        keep = (disc >= 5) & (disc <= 7) & (qty < 24)
        return pa.table(
            {
                "rev_e4": pa.array(
                    [int((cents[keep] * disc[keep]).sum())], pa.int64()
                )
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    total = int(parts["rev_e4"].sum()) if len(parts) else 0
    return pd.DataFrame({"revenue_e4": np.array([total], dtype=np.int64)})


SQL_FORECAST_REVENUE = """
SELECT CAST(COALESCE(SUM(
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
         * CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)
       ), 0) AS BIGINT) AS revenue_e4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


ORACLE_QUERIES["forecast_revenue"] = (
    q_forecast_revenue,
    SQL_FORECAST_REVENUE,
)
