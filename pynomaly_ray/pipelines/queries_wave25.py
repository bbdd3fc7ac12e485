"""Wave-25: GROUPING SETS (the general case completing CUBE/ROLLUP)
and crash-safe checkpointed iteration.

- ``grouping_sets_revenue`` — arbitrary grouping sets ((returnflag,
  linestatus), (linestatus), ()) — NOT a rollup prefix chain, so the
  folds are genuinely independent projections.  The engine scans the
  fact table ONCE for the finest aggregate; every other set folds from
  those few rows driver-side, exactly like the rollup/cube entries.
  A grouping-id column (SQL ``GROUPING()`` bit pattern) disambiguates
  NULL-as-subtotal from (hypothetical) NULL keys.
- ``pagerank_rounds_checkpointed``
  (:mod:`pynomaly_ray.state.iteration`) — the iterative-compute twin
  of the layouts' crash-safety story: every PageRank round lands as a
  parquet generation with a commit marker; a resumed run loads the
  highest committed round and continues to a BIT-IDENTICAL fixed
  point (integer ranks), so a pre-empted 100-TB iteration never
  recomputes finished rounds.  Engine surface + pytest (no queries()
  entry of its own; the un-checkpointed ``pagerank`` oracle already
  certifies the arithmetic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import hash_aggregate
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _cents, _pq


def q_grouping_sets_revenue(sf_dir: str):
    li = _pq(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "l_linestatus": t["l_linestatus"].to_pandas(),
                "rev": _cents(
                    t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
                ),
            }
        )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(rev_cents=("rev", "sum"), n_lines=("rev", "size"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    finest = hash_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        lambda df: df.groupby(["l_returnflag", "l_linestatus"], sort=False)
        .agg(rev_cents=("rev_cents", "sum"), n_lines=("n_lines", "sum"))
        .reset_index(),
    ).to_pandas()
    if finest.empty:
        return pd.DataFrame(
            {
                "l_returnflag": pd.Series(dtype=object),
                "l_linestatus": pd.Series(dtype=object),
                "grp": pd.Series(dtype=np.int64),
                "rev_cents": pd.Series(dtype=np.int64),
                "n_lines": pd.Series(dtype=np.int64),
            }
        )
    # set (rf, ls): grouping id 0
    a = finest.copy()
    a["grp"] = 0
    # set (ls): rf aggregated away -> grouping bit for rf (MSB) = 2
    b = (
        finest.groupby("l_linestatus", sort=False)
        .agg(rev_cents=("rev_cents", "sum"), n_lines=("n_lines", "sum"))
        .reset_index()
    )
    b["l_returnflag"] = None
    b["grp"] = 2
    # set (): both aggregated -> 3
    c = pd.DataFrame(
        {
            "l_returnflag": [None],
            "l_linestatus": [None],
            "rev_cents": [int(finest["rev_cents"].sum())],
            "n_lines": [int(finest["n_lines"].sum())],
            "grp": [3],
        }
    )
    cols = ["l_returnflag", "l_linestatus", "grp", "rev_cents", "n_lines"]
    out = pd.concat([a[cols], b[cols], c[cols]], ignore_index=True)
    out["grp"] = out["grp"].astype(np.int64)
    out["rev_cents"] = out["rev_cents"].astype(np.int64)
    out["n_lines"] = out["n_lines"].astype(np.int64)
    out["l_returnflag"] = out["l_returnflag"].astype(object)
    out["l_linestatus"] = out["l_linestatus"].astype(object)
    return out.sort_values(
        ["grp", "l_returnflag", "l_linestatus"],
        kind="mergesort",
        na_position="last",
    ).reset_index(drop=True)


SQL_GROUPING_SETS_REVENUE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
            AS BIGINT) AS grp,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS rev_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
ORDER BY grp, l_returnflag, l_linestatus
"""

ORACLE_QUERIES["grouping_sets_revenue"] = (
    q_grouping_sets_revenue,
    SQL_GROUPING_SETS_REVENUE,
)
