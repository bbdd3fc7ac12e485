"""Wave-40: bucketed (SMB) per-entity ASOF join.

``asof_bucketed_orders`` answers the same question as the live
``asof_orders`` query (each event's latest same-user order at event
time) but through two persisted BUCKETED layouts
(:func:`pynomaly_ray.sources.bucketed.bucketed_asof_join`): events and
orders each pay ONE keyed exchange at write time (user_id /
o_custkey), after which every asof probe — today's and every later
run's — reads bucket-aligned files with zero shuffle.  The live
``exchange.asof_join`` pays that exchange per run; at a 100-TB corpus
where events are probed against reference state repeatedly, the
layout amortizes it to once.  The DuckDB keyed ``ASOF JOIN`` twin
certifies the whole path (layout write -> per-bucket merge_asof ->
sentinel-gathered inner result) value-for-value.
"""

from __future__ import annotations

import os

import pyarrow as pa

from pynomaly_ray.functions.exchange import collect_sorted
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq


# ---------------------------------------------------------------------------
# Q: asof_bucketed_orders — per-user latest order at event time through
# two co-bucketed layouts, zero shuffle at probe time.
# ---------------------------------------------------------------------------
def q_asof_bucketed_orders(sf_dir: str):
    import shutil
    import tempfile

    from pynomaly_ray.sources.bucketed import (
        bucketed_asof_join,
        write_bucketed,
    )

    root = tempfile.mkdtemp(prefix="pnr-asofsmb-", dir="/tmp")
    try:
        lp = os.path.join(root, "events")
        rp = os.path.join(root, "orders")
        write_bucketed(
            _pq(sf_dir, "events", ["event_id", "ts", "user_id"]),
            ["user_id"],
            8,
            lp,
        )
        write_bucketed(
            _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"]),
            ["o_custkey"],
            8,
            rp,
        )

        joined = bucketed_asof_join(lp, rp, "ts", "o_orderdate")

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


SQL_ASOF_BUCKETED_ORDERS = """
SELECT event_id,
       CAST(FLOOR(epoch_us(o_orderdate) / 86400000000) AS BIGINT)
           AS order_day
FROM events ASOF JOIN orders
  ON events.user_id = orders.o_custkey AND events.ts >= orders.o_orderdate
ORDER BY event_id
"""

ORACLE_QUERIES["asof_bucketed_orders"] = (
    q_asof_bucketed_orders,
    SQL_ASOF_BUCKETED_ORDERS,
)
