"""Deterministic synthetic sequence-table generator (FIXTURES.md §2).

Generates the engine's primary fixture: Parquet partitioned by
``(source, part_idx)`` with columns (doc_id, tokens:list<int32>, n_tok,
source, partition_id), plus planted violations and drifted partitions
with known expected outcomes.  Seeded per partition by (seed, source,
part_idx) so any subset of partitions regenerates identically — the
property the resume test relies on.
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pynomaly_ray.config import SEQUENCE_SCHEMA

SOURCES = ("web", "books", "code", "wiki")
VOCAB = 32768


@dataclass
class GenSpec:
    sources: Sequence[str] = SOURCES
    parts_per_source: int = 16
    rows_per_part: int = 256
    vocab_size: int = VOCAB
    seed: int = 42
    # Drift: these (source, part_idx) pairs sample shifted distributions.
    drifted: Sequence[tuple[str, int]] = ((SOURCES[0], 3), (SOURCES[2], 7))
    # Planted violations (FIXTURES.md §2), all in deterministic positions.
    plant_violations: bool = True


def _part_seed(seed: int, source: str, part_idx: int) -> int:
    return (seed * 1_000_003 + zlib.crc32(source.encode()) + part_idx) % (2**31)


def _zipf_tokens(rng: np.random.Generator, n: int, vocab: int, shifted: bool):
    """Zipf-ish (s=1.1) token ids; drifted partitions draw from the upper
    half of the vocab (FIXTURES.md §2)."""
    # inverse-CDF sampling of a truncated zipf via precomputed weights
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    w = 1.0 / ranks**1.1
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    u = rng.random(n)
    ids = np.searchsorted(cdf, u).astype(np.int64)
    if shifted:
        ids = vocab // 2 + ids % (vocab // 2)
    return ids.astype(np.int32)


def generate_partition(
    source: str, part_idx: int, spec: GenSpec
) -> pa.Table:
    """One partition's rows, fully determined by (spec.seed, source, part_idx)."""
    rng = np.random.default_rng(_part_seed(spec.seed, source, part_idx))
    n = spec.rows_per_part
    drifted = (source, part_idx) in set(spec.drifted)
    mu = 6.5 if drifted else 5.5
    lengths = np.clip(
        rng.lognormal(mean=mu, sigma=0.6, size=n), 8, 2048
    ).astype(np.int64)
    total = int(lengths.sum())
    if total >= 2**31:
        raise ValueError(
            f"partition {source}-{part_idx} would hold {total} tokens, "
            "overflowing int32 list offsets; lower rows_per_part (or "
            "switch the schema to large_list)"
        )
    flat = _zipf_tokens(rng, total, spec.vocab_size, drifted)
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(flat, pa.int32())
    )
    doc_ids = [
        f"{source}-{part_idx:04d}-{row:08d}" for row in range(n)
    ]
    part_id = f"{source}-{part_idx:04d}"
    t = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32), pa.int32()),
            "source": pa.array([source] * n, pa.string()),
            "partition_id": pa.array([part_id] * n, pa.string()),
        }
    )
    return t


# Deterministic planted-violation positions (FIXTURES.md §2). Expected
# violation rows are derivable from these constants in tests.
def plant_violations(tables: dict[str, pa.Table], spec: GenSpec):
    """Mutate the generated tables to plant known violations.

    - duplicate doc_id: row 0 of the first partition is duplicated into the
      last partition (1 extra occurrence -> 1 expected violation row);
    - n_tok mismatch: row 1 of every source's partition 1 gets n_tok+1;
    - unknown source: rows 2-3 of the first partition get source='bogus';
    - null doc_id / null tokens: rows 4 / 5 of the first partition.
    """
    keys = sorted(tables)
    first, last = keys[0], keys[-1]

    def set_col(t: pa.Table, name: str, arr: pa.Array) -> pa.Table:
        i = t.schema.get_field_index(name)
        return t.set_column(i, name, arr)

    # duplicate: append first-partition row 0 into the last partition,
    # keeping the last partition's partition_id for that row.
    dup_row = tables[first].slice(0, 1)
    lp = tables[last]
    dup_row = set_col(
        dup_row, "partition_id", pa.array([lp["partition_id"][0].as_py()])
    )
    tables[last] = pa.concat_tables([lp, dup_row]).combine_chunks()

    # n_tok mismatch on row 1 of every source's part 0001
    for key in keys:
        if key.endswith("-0001"):
            t = tables[key]
            nt = t["n_tok"].to_numpy(zero_copy_only=False).copy()
            nt[1] = nt[1] + 1
            tables[key] = set_col(t, "n_tok", pa.array(nt, pa.int32()))

    # unknown source rows 2-3 of first partition
    t = tables[first]
    src = t["source"].to_pylist()
    src[2] = "bogus"
    src[3] = "bogus"
    t = set_col(t, "source", pa.array(src, pa.string()))
    # null doc_id row 4, null tokens row 5
    doc = t["doc_id"].to_pylist()
    doc[4] = None
    t = set_col(t, "doc_id", pa.array(doc, pa.string()))
    tok = t["tokens"].combine_chunks()
    mask = np.zeros(t.num_rows, dtype=bool)
    mask[5] = True
    indices = pa.array(
        [None if mask[i] else i for i in range(t.num_rows)], pa.int64()
    )
    t = set_col(t, "tokens", tok.take(indices))
    tables[first] = t


def generate_dataset_dir(
    out_dir: str, spec: Optional[GenSpec] = None, force: bool = False
) -> str:
    """Write the full synthetic table as one parquet file per partition
    (the resumable layout the pipeline expects).  Idempotent via a DONE
    marker keyed by the spec."""
    spec = spec or GenSpec()
    # marker keyed by EVERY spec field: a changed spec regenerates instead
    # of silently reusing stale data
    import hashlib

    spec_key = hashlib.sha1(
        repr(
            (
                tuple(spec.sources),
                spec.parts_per_source,
                spec.rows_per_part,
                spec.vocab_size,
                spec.seed,
                tuple(spec.drifted),
                spec.plant_violations,
            )
        ).encode()
    ).hexdigest()[:16]
    marker = os.path.join(out_dir, f"_DONE_{spec_key}")
    if os.path.exists(marker) and not force:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    # regenerating under a DIFFERENT spec: clear the previous spec's
    # part files and markers first — otherwise a shrunken spec leaves
    # extra partitions on disk for glob readers, and a later call with
    # the OLD spec would find its stale marker and silently return the
    # new spec's data
    for name in os.listdir(out_dir):
        if name.startswith("_DONE_") or (
            name.startswith("part-") and name.endswith(".parquet")
        ):
            os.unlink(os.path.join(out_dir, name))
    keys = [
        (source, p)
        for source in spec.sources
        for p in range(spec.parts_per_source)
    ]
    tables: dict[str, pa.Table] = {}
    try:  # parallel generation when a Ray session exists (partitions are
        # independently seeded, so results are identical either way)
        import ray

        if ray.is_initialized():
            gen = ray.remote(generate_partition)
            refs = [gen.remote(s, p, spec) for s, p in keys]
            for (s, p), t in zip(keys, ray.get(refs)):
                tables[f"{s}-{p:04d}"] = t
    except ImportError:
        pass
    if not tables:
        for s, p in keys:
            tables[f"{s}-{p:04d}"] = generate_partition(s, p, spec)
    if spec.plant_violations:
        plant_violations(tables, spec)
    for key, t in tables.items():
        pq.write_table(t, os.path.join(out_dir, f"part-{key}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
