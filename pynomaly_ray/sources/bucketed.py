"""Sort-merge-bucket (SMB) persisted layout: co-partitioned parquet.

The repeated-join optimization at 100-TB scale: pay ONE key-hash
exchange up front by writing a table into ``bucket=<i>/`` parquet
directories (the same key hash the live exchange uses —
``functions/exchange._bucket_of`` — so a layout written today routes
identically forever), then every later join against any co-bucketed
table reads bucket-aligned files directly: one task per bucket, ZERO
shuffle, regardless of how many times the key is joined on.  This is
the "pick ONE partitioning key and reuse it across stages" prescription
made durable across jobs.

Reference relation: the reference engine (PyNomaly, single process)
never persists layouts; this is engine surface the 100-TB target needs
(storage-bucketed joins a la Hive SMB / Iceberg bucket transform).

Crash/retry safety: the write routes through the SAME keyed exchange a
live join would use, so exactly ONE task owns each bucket and writes
``bucket=<i>/data.parquet`` — a retried task overwrites its own file
(file name == bucket id, fully deterministic), never duplicating rows;
the ``_bucketed.json`` manifest is written LAST and is the commit
marker — a layout without it is unfinished and refuses to serve joins.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as papq

import ray.data as rd

from pynomaly_ray.functions.exchange import _bucket_of

_MANIFEST = "_bucketed.json"


def write_bucketed(ds, key_cols: Sequence[str], num_buckets: int, path: str) -> dict:
    """Write ``ds`` as a bucketed parquet layout under ``path``.

    One keyed exchange routes every row to its bucket's writer task;
    the writer owns its bucket exclusively and writes (atomically via
    rename) ``bucket=<i>/data.parquet``.  Returns (and persists) the
    manifest.
    """
    from pynomaly_ray.functions.exchange import hash_aggregate

    key_cols = list(key_cols)
    os.makedirs(path, exist_ok=True)
    for i in range(num_buckets):
        os.makedirs(os.path.join(path, f"bucket={i}"), exist_ok=True)

    def write_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        # every row in this task shares one bucket (that's what the
        # exchange routed on), so the first row names the file
        i = int(_bucket_of(t.slice(0, 1), key_cols, num_buckets)[0])
        dest = os.path.join(path, f"bucket={i}", "data.parquet")
        tmp = dest + ".tmp"
        papq.write_table(t, tmp)
        os.replace(tmp, dest)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    parts = hash_aggregate(
        ds, key_cols, write_bucket, num_partitions=num_buckets, arrow=True
    ).to_pandas()
    schema = ds.schema()
    arrow_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(schema.names, schema.types)]
    )
    manifest = {
        "key_cols": key_cols,
        "num_buckets": int(num_buckets),
        "rows": int(parts["rows"].sum()),
        "schema_hex": arrow_schema.serialize().to_pybytes().hex(),
    }
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))  # commit marker
    return manifest


def load_manifest(path: str) -> dict:
    mp = os.path.join(path, _MANIFEST)
    if not os.path.exists(mp):
        raise FileNotFoundError(
            f"{path} has no {_MANIFEST} commit marker — the bucketed "
            "layout is unfinished or not a bucketed layout; rewrite it "
            "with write_bucketed before joining on it"
        )
    with open(mp) as f:
        return json.load(f)


def _bucket_schema(manifest: dict) -> pa.Schema:
    return pa.ipc.read_schema(
        pa.BufferReader(bytes.fromhex(manifest["schema_hex"]))
    )


def _read_bucket(path: str, i: int, schema: pa.Schema) -> pa.Table:
    d = os.path.join(path, f"bucket={i}")
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    if not files:
        return schema.empty_table()
    return pa.concat_tables([papq.read_table(f) for f in files])


def bucketed_join(
    path_a: str,
    path_b: str,
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    how: str = "inner",
):
    """Shuffle-free join of two co-bucketed layouts -> ray.data.Dataset.

    Both layouts must share num_buckets and key WIDTH (column names may
    differ; positional key match, like pd.merge left_on/right_on).  One
    Ray task per bucket reads both sides' bucket files and merges —
    matches meet by construction because both layouts used the same key
    hash.  ``merge_fn`` collapses the join output inside the bucket task
    (same contract as exchange.hash_join).  Null-key rows follow
    pd.merge semantics (dropped on inner).
    """
    ma, mb = load_manifest(path_a), load_manifest(path_b)
    if ma["num_buckets"] != mb["num_buckets"]:
        raise ValueError(
            f"bucket count mismatch: {ma['num_buckets']} vs "
            f"{mb['num_buckets']} — layouts are not co-partitioned"
        )
    if len(ma["key_cols"]) != len(mb["key_cols"]):
        raise ValueError("key width mismatch between bucketed layouts")
    p = ma["num_buckets"]
    sa, sb = _bucket_schema(ma), _bucket_schema(mb)
    ka, kb = ma["key_cols"], mb["key_cols"]

    def join_bucket(t: pa.Table) -> pa.Table:
        outs = []
        for i in t["bucket"].to_pylist():
            da = _read_bucket(path_a, i, sa).to_pandas()
            db = _read_bucket(path_b, i, sb).to_pandas()
            m = da.merge(db, left_on=ka, right_on=kb, how=how)
            if merge_fn is not None:
                m = merge_fn(m)
            outs.append(
                pa.Table.from_pandas(
                    m, preserve_index=False
                ).replace_schema_metadata(None)
            )
        return pa.concat_tables(outs, promote_options="permissive")

    ids = rd.from_items([{"bucket": i} for i in range(p)])
    return ids.map_batches(join_bucket, batch_format="pyarrow", batch_size=1)


def bucketed_aggregate(
    path: str,
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
):
    """Shuffle-free grouped aggregate over a bucketed layout.

    Every occurrence of a key lives in exactly one bucket (that is what
    the layout paid its one exchange for), so a per-bucket ``merge_fn``
    (e.g. ``df.groupby(keys).sum()``) is globally exact with ZERO data
    movement — the repeated-aggregate twin of :func:`bucketed_join`.
    Returns a ray.data.Dataset of the merged rows, one task per bucket.
    """
    m = load_manifest(path)
    schema = _bucket_schema(m)
    p = m["num_buckets"]

    def agg_bucket(t: pa.Table) -> pa.Table:
        outs = []
        for i in t["bucket"].to_pylist():
            df = _read_bucket(path, i, schema).to_pandas()
            outs.append(
                pa.Table.from_pandas(
                    merge_fn(df), preserve_index=False
                ).replace_schema_metadata(None)
            )
        return pa.concat_tables(outs, promote_options="permissive")

    ids = rd.from_items([{"bucket": i} for i in range(p)])
    return ids.map_batches(agg_bucket, batch_format="pyarrow", batch_size=1)


def bucketed_join_live(
    ds,
    path: str,
    live_keys: Sequence[str],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    how: str = "inner",
):
    """Join a LIVE Dataset against a persisted layout — only the live
    side moves.

    The production increment shape: today's delta joins yesterday's
    master layout without rewriting it.  The live side pays one keyed
    exchange at the layout's bucket count (same ``_bucket_of`` hash, so
    co-location is guaranteed); each reducer then reads its OWN bucket's
    persisted file locally and merges — the persisted side is never
    shuffled, never re-read outside its bucket.  ``live_keys`` match the
    layout's key columns positionally (pd.merge left_on/right_on).
    """
    from pynomaly_ray.functions.exchange import hash_aggregate

    m = load_manifest(path)
    schema = _bucket_schema(m)
    p = m["num_buckets"]
    live_keys = list(live_keys)
    if len(live_keys) != len(m["key_cols"]):
        raise ValueError("key width mismatch with the bucketed layout")

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.iloc[:0]
        i = int(
            _bucket_of(
                pa.Table.from_pandas(
                    df.iloc[:1], preserve_index=False
                ),
                live_keys,
                p,
            )[0]
        )
        right = _read_bucket(path, i, schema).to_pandas()
        out = df.merge(
            right, left_on=live_keys, right_on=m["key_cols"], how=how
        )
        return merge_fn(out) if merge_fn is not None else out

    return hash_aggregate(ds, live_keys, join_bucket, num_partitions=p)
