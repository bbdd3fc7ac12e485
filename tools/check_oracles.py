"""Dev harness emulating the driver's oracle comparison.

Runs every queries() entry and its oracle_sql() twin at a given sf dir,
compares row count, schema (column names), and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def arrow_types(obj) -> dict:
    """Column -> pyarrow type, the dtype surface the driver's value hash
    sees (round 1 lesson: DuckDB integer SUM is decimal128 unless CAST)."""
    import pyarrow as pa

    t = obj if isinstance(obj, pa.Table) else pa.Table.from_pandas(
        obj, preserve_index=False
    )
    return {n: str(t.schema.field(n).type) for n in t.schema.names}


def compare(
    name: str,
    ray_df: pd.DataFrame,
    sql_df: pd.DataFrame,
    ray_types: dict | None = None,
    sql_types: dict | None = None,
) -> str:
    if list(sorted(ray_df.columns)) != list(sorted(sql_df.columns)):
        return f"SCHEMA MISMATCH ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    if ray_types and sql_types:
        bad = {
            c: (ray_types.get(c), sql_types.get(c))
            for c in ray_df.columns
            if ray_types.get(c) != sql_types.get(c)
        }
        if bad:
            return f"DTYPE MISMATCH {bad}"
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT MISMATCH ray={len(ray_df)} sql={len(sql_df)}"
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0):
                return f"VALUE MISMATCH in {c}"
        else:
            if not (av == bv).all():
                return f"VALUE MISMATCH in {c}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pynomaly_ray.cli import _ensure_ray

    ray = _ensure_ray(8)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:20s} RAY ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:20s} rows-only: {len(ray_df)} rows")
            continue
        sql_arrow = con.execute(oracles[name]).arrow()
        sql_df = sql_arrow.to_pandas()
        verdict = compare(
            name, ray_df, sql_df, arrow_types(ray_df), arrow_types(sql_arrow)
        )
        print(f"{name:20s} {verdict}  ({len(ray_df)} rows)")
        if verdict != "OK":
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
