"""Per-partition lineage + metrics manifest, and checkpoint/resume.

Layout (north_rule "resumable from checkpoint"):

    out_dir/
      violations/            parquet part files (violation rows)
      partitions/            parquet part files (per-partition reports)
      manifest/<run>.parquet the manifest snapshot: one row per partition
                             (partition_id, status, n_rows, n_violations,
                              loop_score, stats_digest, run_id)

A restarted run reads every snapshot under ``manifest/``, collects the
completed partition_ids, and *filters them out of the input scan* before
any heavy work (a broadcast anti-join, no shuffle).  Because every
accumulator in the pipeline is order-insensitive and all hashes are
stable (functions/hashing.py), the union of a partial run + a resumed run
is byte-identical to a single full run — asserted by the resume test.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import pyarrow as pa
import pyarrow.parquet as pq


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def write_manifest_snapshot(
    out_dir: str, report: pa.Table, run_id: str
) -> str:
    """Write one atomic manifest snapshot (tmp + rename) for this run."""
    d = manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"{run_id}.parquet")
    tmp = final + ".tmp"
    cols = [
        "partition_id",
        "source",
        "n_rows",
        "n_violations",
        "loop_score",
        "status",
    ]
    pq.write_table(report.select(cols), tmp)
    os.replace(tmp, final)
    return final


def completed_partitions(out_dir: str) -> frozenset[str]:
    """partition_ids finished by any prior run (for resume skipping)."""
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return frozenset()
    done: set[str] = set()
    for name in sorted(os.listdir(d)):
        if name.endswith(".parquet"):
            t = pq.read_table(os.path.join(d, name), columns=["partition_id"])
            done.update(t["partition_id"].to_pylist())
    return frozenset(done)


def read_full_manifest(out_dir: str) -> Optional[pa.Table]:
    """Union of all manifest snapshots, deduplicated by partition_id
    (last snapshot wins; snapshots are sorted by run file name)."""
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return None
    tables = [
        pq.read_table(os.path.join(d, n))
        for n in sorted(os.listdir(d))
        if n.endswith(".parquet")
    ]
    if not tables:
        return None
    merged = pa.concat_tables(tables)
    df = merged.to_pandas().drop_duplicates("partition_id", keep="last")
    df = df.sort_values("partition_id", kind="mergesort").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)
