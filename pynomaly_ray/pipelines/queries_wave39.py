"""Wave-39: storage-partitioned ASOF join over time-sorted layouts.

``asof_sorted_events`` joins two persisted SORTED layouts — events by
``ts``, orders by ``o_orderdate`` — with ZERO shuffle at probe time:
each left file reads only the right files the zone plan proves can
hold a match (its overlapping zones plus the boundary predecessor
file(s); :func:`pynomaly_ray.sources.sorted_layout.asof_join_plan`).
This is the global (un-keyed) asof — "the latest reference state at
event time" — complementing the per-entity
``exchange.asof_join``-backed ``asof_orders`` query, which must hash
on the entity key.  At a 100-TB time-sorted corpus the probe side
never re-sorts and never exchanges; task count == left file count.

The in-query assertion pins what the layout pays for: total right-file
reads stay near-diagonal (overlap + <=1 predecessor per task), never
the all-pairs cross product.  Output projects only tie-invariant right
columns (the matched order DATE), since which row wins among equal
keys is engine-defined in every system (DuckDB included).
"""

from __future__ import annotations

import os

import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq


# ---------------------------------------------------------------------------
# Q: asof_sorted_events — for each event, the latest order date at or
# before the event's timestamp (global backward asof), through two
# persisted sorted layouts joined with zero shuffle.
# ---------------------------------------------------------------------------
def q_asof_sorted_events(sf_dir: str):
    import shutil
    import tempfile

    from pynomaly_ray.sources.sorted_layout import (
        asof_join_plan,
        sorted_asof_join,
        write_sorted,
    )

    root = tempfile.mkdtemp(prefix="pnr-asofspj-", dir="/tmp")
    try:
        lp = os.path.join(root, "events")
        rp = os.path.join(root, "orders")
        # 8 partitions per side so the plan-pruning assertion below is
        # non-vacuous at gate scale (auto fan-out would pick 1)
        write_sorted(
            _pq(sf_dir, "events", ["event_id", "ts"]),
            "ts",
            lp,
            num_partitions=8,
        )
        write_sorted(
            _pq(sf_dir, "orders", ["o_orderdate"]),
            "o_orderdate",
            rp,
            num_partitions=8,
        )

        # the property the layout pays for: each task reads its
        # overlapping right zones plus at most the boundary
        # predecessor file(s) — never the whole right history
        plan = asof_join_plan(lp, rp, "backward")
        n_l = len(plan)
        total = sum(len(p["rfiles"]) for p in plan)
        if n_l > 1 and total > 3 * max(n_l, 8):
            raise AssertionError(
                f"asof join plan degenerated: {total} right-file reads "
                f"across {n_l} tasks"
            )

        joined = sorted_asof_join(lp, rp, direction="backward")

        def project(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            day = pc.floor(
                pc.divide(
                    pc.cast(t["o_orderdate"], pa.int64()),
                    pa.scalar(86_400_000_000, pa.int64()),
                )
            )
            return pa.table(
                {
                    "event_id": t["event_id"],
                    "order_day": pc.cast(day, pa.int64()),
                }
            )

        out = joined.map_batches(project, batch_format="pyarrow")
        return collect_sorted(out, ["event_id"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_ASOF_SORTED_EVENTS = """
SELECT event_id,
       CAST(FLOOR(epoch_us(o_orderdate) / 86400000000) AS BIGINT)
           AS order_day
FROM events ASOF JOIN orders ON events.ts >= orders.o_orderdate
ORDER BY event_id
"""

ORACLE_QUERIES["asof_sorted_events"] = (
    q_asof_sorted_events,
    SQL_ASOF_SORTED_EVENTS,
)
