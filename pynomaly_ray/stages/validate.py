"""Stage A: the single-scan validator — constraints, stats, and the
uniqueness pre-aggregation in ONE pass over the input.

A callable class (actor pool) for ``ds.map_batches(SequenceValidator,
batch_format="pyarrow", concurrency=N)``: per-actor setup (broadcast
source universe via ``ray.put``/``ray.get``) happens once in ``__init__``
(SURVEY.md §2.3), per-batch work is fully vectorized.

The output stream is a tagged union of three row kinds:

  - ``violation``: sparse constraint-violation rows;
  - ``partial``:   tiny per-partition partial-stat rows (stages/stats.py);
  - ``docpart``:   batch-level (doc_id, partition_id, cnt, salt) partials
                   feeding the salted uniqueness shuffle
                   (stages/uniqueness.py).

Only these small streams cross the stage boundary — the wide ``tokens``
payload never leaves the scan, and the input is read exactly once.  This
is what makes the pipeline viable at 10^12 sequences.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from pynomaly_ray.config import PARTIAL_STATS_SCHEMA, VIOLATION_SCHEMA
from pynomaly_ray.stages.constraints import check_sequence_batch
from pynomaly_ray.stages.stats import partial_stats_batch
from pynomaly_ray.stages.uniqueness import project_doc_partition

# Union schema of the tagged stage-A output stream.
_UNION_FIELDS = (
    [("kind", pa.string())]
    + [(f.name, f.type) for f in VIOLATION_SCHEMA]
    + [
        (f.name, f.type)
        for f in PARTIAL_STATS_SCHEMA
        if f.name not in ("partition_id",)
    ]
    + [("doc_hash", pa.int64()), ("cnt", pa.int64()), ("salt", pa.int64())]
)
UNION_SCHEMA = pa.schema(_UNION_FIELDS)


def _pad_to_union(t: pa.Table, kind: str) -> pa.Table:
    cols = {"kind": pa.array([kind] * t.num_rows, pa.string())}
    for f in UNION_SCHEMA:
        if f.name == "kind":
            continue
        if t.schema.get_field_index(f.name) >= 0:
            cols[f.name] = pc.cast(
                t[f.name], f.type
            ) if t.schema.field(f.name).type != f.type else t[f.name]
        else:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
    return pa.table(cols, schema=UNION_SCHEMA)


class SequenceValidator:
    """Constraint + partial-stats + uniqueness-partial kernel.

    Constructor args may be plain values or ``ray.ObjectRef`` (broadcast
    once with ``ray.put``, fetched once per actor — never per batch).
    """

    def __init__(
        self,
        valid_sources=None,
        vocab_size: Optional[int] = None,
        emit_docparts: bool = True,
        salt_buckets: int = 16,
    ):
        import ray

        def _unwrap(x):
            return ray.get(x) if isinstance(x, ray.ObjectRef) else x

        valid_sources = _unwrap(valid_sources)
        self.valid_sources = (
            frozenset(valid_sources) if valid_sources is not None else None
        )
        # Arrow value set built ONCE per actor, not per batch
        self.valid_sources_arr = (
            pa.array(sorted(self.valid_sources), pa.string())
            if self.valid_sources is not None
            else None
        )
        self.vocab_size = _unwrap(vocab_size)
        self.emit_docparts = _unwrap(emit_docparts)
        self.salt_buckets = _unwrap(salt_buckets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        violations, valid_mask = check_sequence_batch(
            batch,
            self.valid_sources,
            self.vocab_size,
            valid_sources_arr=self.valid_sources_arr,
        )
        partials = partial_stats_batch(
            batch, valid_mask, self.vocab_size or 1
        )
        out = []
        if violations.num_rows:
            out.append(_pad_to_union(violations, "violation"))
        if partials.num_rows:
            out.append(_pad_to_union(partials, "partial"))
        if self.emit_docparts:
            docparts = project_doc_partition(batch, self.salt_buckets)
            if docparts.num_rows:
                out.append(_pad_to_union(docparts, "docpart"))
        if not out:
            return UNION_SCHEMA.empty_table()
        return pa.concat_tables(out)


def split_union(kind: str, columns=None):
    """Vectorized filter selecting one ``kind`` from the stage-A stream."""

    def _f(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t["kind"], kind))
        return sel.select(columns) if columns else sel

    return _f
