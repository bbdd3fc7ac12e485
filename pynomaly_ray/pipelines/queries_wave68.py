"""Wave-68: incrementally-maintained heavy-hitters view (MG matview).

``matview_top_users`` — a materialized view keyed by event_type whose
``mg`` column holds Misra-Gries counter blobs over the (bucketed) user
id; refreshed in TWO crawl increments, retried once (exactly-once
no-op asserted in-query), then read as the per-type top-5 users.  The
user domain (user_id % 50 = 50 values) sits under the _MG_K=64 counter
budget, so no prune ever fires and the maintained counters are EXACT —
which is what lets DuckDB certify the full incremental machinery
(partial blobs → bucket folds → cross-increment merges → top-k read)
against a plain GROUP BY + ROW_NUMBER twin.  Past the budget the same
view degrades to the one-sided-undercount summary pinned by pytest —
the trending-tokens-per-source shape at crawl scale, where the view
holds k counters per key, never the key's value set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq


def q_matview_top_users(sf_dir: str):
    import shutil
    import tempfile

    from pynomaly_ray.state.matview import (
        create_matview,
        load_manifest,
        mg_top,
        read_matview,
        refresh_matview,
    )

    root = tempfile.mkdtemp(prefix="pnr-mgview-", dir="/tmp")
    try:
        view = f"{root}/top_users"

        def increment(parity: int):
            ds = _pq(sf_dir, "events", ["event_id", "user_id", "event_type"])

            def pre(t: pa.Table) -> pa.Table:
                df = t.to_pandas()
                df = df[df["event_id"].to_numpy(np.int64) % 2 == parity]
                return pa.Table.from_pandas(
                    pd.DataFrame(
                        {
                            "event_type": df["event_type"].to_numpy(object),
                            "uid": (
                                df["user_id"].to_numpy(np.int64) % 50
                            ).astype(str),
                        }
                    ),
                    preserve_index=False,
                )

            return ds.map_batches(pre, batch_format="pyarrow")

        create_matview(
            view,
            increment(0),
            keys=["event_type"],
            agg_spec={"users": ("uid", "mg")},
            run_id="inc0",
        )
        refresh_matview(view, increment(1), "inc1")
        # exactly-once: re-delivering inc1 must be a committed no-op
        gen_before = load_manifest(view)["gen"]
        refresh_matview(view, increment(1), "inc1")
        if load_manifest(view)["gen"] != gen_before:
            raise AssertionError("retried refresh must not advance gen")

        state = read_matview(view).to_pandas()
        out = mg_top(state, "users", 5)
        out = out.sort_values(
            ["event_type", "cnt", "item"],
            ascending=[True, False, True],
            kind="mergesort",
        ).reset_index(drop=True)
        out["uid"] = out["item"].astype(object)
        out["cnt"] = out["cnt"].astype(np.int64)
        return out[["event_type", "uid", "cnt"]]
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_MATVIEW_TOP_USERS = """
WITH c AS (
  SELECT event_type, CAST(user_id % 50 AS VARCHAR) AS uid,
         COUNT(*) AS cnt
  FROM events GROUP BY event_type, uid
)
SELECT event_type, uid, CAST(cnt AS BIGINT) AS cnt
FROM c
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY event_type ORDER BY cnt DESC, uid ASC
) <= 5
ORDER BY event_type, cnt DESC, uid
"""


ORACLE_QUERIES["matview_top_users"] = (
    q_matview_top_users,
    SQL_MATVIEW_TOP_USERS,
)
