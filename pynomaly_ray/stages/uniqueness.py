"""doc_id uniqueness: the one unavoidable all-to-all shuffle, skew-aware.

Semantics (north_rule + FIXTURES.md §2): a doc_id appearing c > 1 times
yields c-1 violation rows — every occurrence beyond the first, with the
"first" chosen deterministically (lowest partition_id), so retries and
resumes emit identical rows.

Scale design (SURVEY.md §4):

  phase 0 (inside the stage-A scan) — project to (doc_id, partition_id)
      and pre-aggregate within the batch -> (doc_id, partition_id, cnt,
      salt).  Only these short columns ever shuffle, never the tokens.
  phase 1 — ``groupby("doc_id").aggregate(Sum("cnt"))``.  Ray Data's
      aggregate does block-level partial aggregation before the exchange
      (accumulate/merge), so a pathologically hot doc_id reaches the
      reducer as <= n_blocks partial rows — the two-level salted
      aggregation of the north_rule, with the salt supplied by block
      boundaries.  The explicit ``salt`` column is retained for engines /
      versions whose groupby lacks map-side combine: group by
      ``["doc_id", "salt"]`` first, then by ``doc_id``.
  phase 2 — totals > 1 form a (tiny) duplicate set, broadcast back; the
      docpart stream is filtered by membership (``pc.is_in``) and only
      the surviving rows — duplicates only — take the per-group path that
      lists occurrences.  Vectorized end-to-end for the common
      all-unique case; per-group Python only over actual duplicates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pynomaly_ray.functions.hashing import hash_strings, salt_of


def project_doc_partition(batch: pa.Table, salt_buckets: int = 16) -> pa.Table:
    """Batch-local pre-aggregation to (doc_id, doc_hash, partition_id,
    cnt, salt).  ``doc_hash`` (stable SipHash of doc_id, as int64) lets
    downstream total-counting run as numpy integer ops instead of string
    groupbys; exact doc_id comparison still guards against collisions.

    Fast path: when every (doc_id) in the batch is already unique (the
    overwhelmingly common case), all counts are 1 and no pandas groupby
    runs — pure hashing + arrow column reuse."""
    doc_id = batch["doc_id"]
    part_id = batch["partition_id"]
    null_mask = pc.is_null(doc_id).to_numpy(zero_copy_only=False)
    if null_mask.any():
        keep = pa.array(~null_mask)
        doc_id = doc_id.filter(keep)
        part_id = part_id.filter(keep)
    ser = doc_id.to_pandas()
    hashes = hash_strings(ser).view(np.int64)
    if len(np.unique(hashes)) == len(hashes):
        return pa.table(
            {
                "doc_id": doc_id,
                "partition_id": part_id,
                "cnt": pa.array(np.ones(len(hashes), dtype=np.int64)),
                "doc_hash": pa.array(hashes),
                "salt": pa.array(salt_of(part_id, salt_buckets)),
            }
        )
    df = pd.DataFrame({"doc_id": ser, "partition_id": part_id.to_pandas()})
    agg = (
        df.groupby(["doc_id", "partition_id"], sort=False, dropna=False)
        .size()
        .reset_index(name="cnt")
    )
    agg["doc_hash"] = hash_strings(agg["doc_id"]).view(np.int64)
    agg["salt"] = salt_of(agg["partition_id"], salt_buckets)
    return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)


def _extras_per_partition(occ: pd.DataFrame) -> dict[str, int]:
    """Occurrences (partition_id, cnt) -> extras per partition, with the
    single tolerated occurrence assigned to the lowest partition_id."""
    if occ.empty or occ["cnt"].sum() <= 1:
        return {}
    g = occ.sort_values("partition_id", kind="mergesort")
    out: dict[str, int] = {}
    tolerated = 1
    for pid, cnt in zip(g["partition_id"], g["cnt"]):
        extra = int(cnt) - tolerated
        tolerated = 0
        if extra > 0:
            out[pid] = out.get(pid, 0) + extra
    return out


def emit_duplicate_violations(group: pd.DataFrame) -> pd.DataFrame:
    """Violation rows for one duplicated doc_id's occurrences.

    Runs only over confirmed duplicates (a tiny set), never the full key
    space.  Incremental-correct: with checkpointed occurrences from prior
    runs (``is_prior == 1``), emits only the *new* extras —
    extras(cumulative) minus extras(prior) per partition — so the union
    of all runs' violations equals a single full run's, regardless of how
    the input was split (the resume-identity guarantee).
    """
    doc = group["doc_id"].iloc[0]
    occ = (
        group.groupby("partition_id", sort=False, dropna=False)["cnt"]
        .sum()
        .reset_index()
    )
    cum = _extras_per_partition(occ)
    if "is_prior" in group.columns and group["is_prior"].any():
        prior_occ = (
            group[group["is_prior"] == 1]
            .groupby("partition_id", sort=False, dropna=False)["cnt"]
            .sum()
            .reset_index()
        )
        prior = _extras_per_partition(prior_occ)
    else:
        prior = {}
    rows: list[str] = []
    for pid, extra in sorted(cum.items()):
        new = extra - prior.get(pid, 0)
        rows.extend([pid] * max(new, 0))
    return pd.DataFrame(
        {
            "doc_id": [doc] * len(rows),
            "partition_id": rows,
            "check": ["duplicate_doc_id"] * len(rows),
            "detail": ["duplicate doc_id occurrence"] * len(rows),
        }
    )


_EMPTY_VIOL = {
    "doc_id": pa.array([], pa.string()),
    "partition_id": pa.array([], pa.string()),
    "check": pa.array([], pa.string()),
    "detail": pa.array([], pa.string()),
}


def duplicates_from_docparts(docparts_ds, prior_docparts_ds=None):
    """Uniqueness check over pre-aggregated docpart rows.

    ``prior_docparts_ds`` is checkpointed occurrence state from earlier
    runs (see pipelines/validation.py) — duplicates spanning a completed
    and a resumed partition are still detected, attributed exactly as a
    single full run would.  Returns a Dataset of violation rows.
    """
    import ray

    from pynomaly_ray.functions.exchange import hash_aggregate

    def tag(val: int):
        def _t(t: pa.Table) -> pa.Table:
            return t.append_column(
                "is_prior", pa.array(np.full(t.num_rows, val, dtype=np.int64))
            )

        return _t

    union_ds = docparts_ds.map_batches(tag(0), batch_format="pyarrow")
    if prior_docparts_ds is not None:
        union_ds = union_ds.union(
            prior_docparts_ds.map_batches(tag(1), batch_format="pyarrow")
        )
    union_ds = union_ds.materialize()  # consumed twice below; small columns

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False)["cnt"].sum().reset_index(name="total")
        return g[g["total"] > 1]

    dup_totals = hash_aggregate(union_ds, ["doc_id"], merge).to_pandas()
    dup_ids = dup_totals["doc_id"].tolist() if len(dup_totals) else []
    if not dup_ids:
        return ray.data.from_arrow(pa.table(_EMPTY_VIOL))
    dup_set = pa.array(sorted(dup_ids), pa.string())

    def only_dups(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=dup_set))

    # confirmed duplicates are sparse by contract -> driver-side emit
    dups_df = union_ds.map_batches(
        only_dups, batch_format="pyarrow"
    ).to_pandas()
    frames = [
        emit_duplicate_violations(g)
        for _, g in dups_df.groupby("doc_id", sort=True)
    ]
    out = pd.concat(frames, ignore_index=True)
    return ray.data.from_arrow(
        pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
        if len(out)
        else pa.table(_EMPTY_VIOL)
    )


def duplicate_violations(ds, *, batch_size: int = 8192, salt_buckets: int = 16):
    """Standalone uniqueness pipeline over a full sequence Dataset
    (projects + pre-aggregates itself; prefer the fused stage-A path in
    pipelines/validation.py which reads the input only once)."""
    projected = ds.map_batches(
        lambda t: project_doc_partition(t, salt_buckets),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return duplicates_from_docparts(projected)
