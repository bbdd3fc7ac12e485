"""CSV / JSON-lines -> Dataset readers for corpus interchange formats.

Crawl snapshots and annotation drops commonly arrive as CSV or JSONL
before they are compacted to parquet; these readers give those formats
the same two fixes ``read_parquet_clean`` applies (schema-metadata strip
for Ray's schema-dedup fast path, caller-controlled block sizing), plus
explicit-schema support so a 100-TB ingest never trusts type inference
(CSV inference samples the head of each file — an all-digits doc_id
column in one shard and an alphanumeric one in another would otherwise
produce blocks with CONFLICTING column types mid-pipeline).

Scale note: both formats are row-oriented and uncompressed-column-blind
— the engine treats them as INGEST-ONLY edges.  The first pipeline step
after reading should be a projection to the needed columns and a
``write_parquet`` compaction; every repeated-scan operator reads the
parquet.  (The reference engine ingests ndarrays/DataFrames only —
reference/PyNomaly/loop.py:300-340 — so file-format sources are engine
surface, not ported behavior.)
"""

from __future__ import annotations

import ray.data as rd

from pynomaly_ray.sources.parquet import strip_schema_metadata


def _gzip_kwargs(paths) -> dict:
    """``arrow_open_stream_args`` for gzip-compressed inputs (crawl
    snapshots ship as .csv.gz / .jsonl.gz at least as often as plain) —
    applied only when EVERY file is .gz, since the stream decompressor
    is per-read-call, not per-file; mixed drops should be read in two
    calls and unioned.  Directory paths are expanded one level so the
    common crawl layout (a directory of .gz shards) decompresses instead
    of feeding raw gzip bytes to the parser."""
    import os

    ps = [paths] if isinstance(paths, str) else list(paths)
    files: list[str] = []
    for p in ps:
        p = str(p)
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if not f.startswith(".")
            )
        else:
            files.append(p)
    gz = [f.endswith(".gz") for f in files]
    if files and all(gz):
        return {"arrow_open_stream_args": {"compression": "gzip"}}
    if any(gz):
        raise ValueError(
            "mixed .gz and plain paths in one read call; split the call"
        )
    return {}


def read_csv_clean(
    paths,
    *,
    schema=None,
    override_num_blocks: int | None = None,
):
    """CSV -> Dataset.  ``schema``: optional pyarrow.Schema applied at
    the Arrow CSV parser (``convert_options.column_types``), making
    column types explicit instead of per-file-inferred.  ``.gz`` paths
    decompress on the fly."""
    from pyarrow import csv as pacsv

    kwargs = _gzip_kwargs(paths)
    if schema is not None:
        kwargs["convert_options"] = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema}
        )
    ds = rd.read_csv(paths, override_num_blocks=override_num_blocks, **kwargs)
    return ds.map_batches(
        strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )


def read_json_clean(
    paths,
    *,
    override_num_blocks: int | None = None,
):
    """JSON-lines -> Dataset (pyarrow JSON parser via Ray's reader).
    ``.gz`` paths decompress on the fly."""
    ds = rd.read_json(
        paths, override_num_blocks=override_num_blocks, **_gzip_kwargs(paths)
    )
    return ds.map_batches(
        strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )
