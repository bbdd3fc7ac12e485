"""Benchmark harness. Prints ONE JSON line with the headline pipeline
wall-time plus per-query timings.

  python bench.py                 # $GRAFT_SF_DIR (default sf0.1), $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling       # same job at num_cpus=8 vs num_cpus=32 in
                                  # fresh processes -> throughput + efficiency

Headline: the flagship validation pipeline (constraints + stats + salted
uniqueness + LoOP drift) over a synthesized sequence table sized to the
scale factor (deterministic, cached under /tmp/pnr_bench) — the engine's
native input shape per BASELINE.json input_hint.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_SPECS = {
    # sf name -> (parts_per_source, rows_per_part)
    "sf0.001": (8, 64),
    "sf0.01": (16, 512),
    "sf0.1": (48, 8192),
}


def bench_data_dir(sf_name: str) -> str:
    from pynomaly_ray.sources.datagen import GenSpec, generate_dataset_dir

    parts, rows = SF_SPECS.get(sf_name, SF_SPECS["sf0.1"])
    d = f"/tmp/pnr_bench/{sf_name}"
    generate_dataset_dir(d, GenSpec(parts_per_source=parts, rows_per_part=rows))
    return d


def run_headline(sf_name: str) -> dict:
    from pynomaly_ray.config import ValidationConfig
    from pynomaly_ray.pipelines.validation import (
        run_validation,
        sequence_dataset_from_dir,
    )
    from pynomaly_ray.sources.datagen import SOURCES

    data_dir = bench_data_dir(sf_name)
    cfg = ValidationConfig(valid_sources=list(SOURCES), n_neighbors=10, extent=3)

    # Warm-up: one full untimed run, so the timed run measures steady-state
    # compute + shuffle rather than page-cache misses and Ray worker spawn
    # (cold worker startup scales with num_cpus and would otherwise bias
    # the scaling comparison against the larger session).
    run_validation(
        sequence_dataset_from_dir(data_dir),
        cfg,
        out_dir=None,
        collect_violations=False,
    )

    # best-of-2 timed runs: this sandbox's wall-clock noise is large
    # (shared virtualized host); min is the stable steady-state estimate.
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        res = run_validation(
            sequence_dataset_from_dir(data_dir),
            cfg,
            out_dir=None,
            collect_violations=False,
        )
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    return {
        "seconds": wall,
        "seconds_all": [round(w, 3) for w in walls],
        "sequences": res.n_sequences,
        "sequences_per_sec": res.n_sequences / wall,
        "partitions": res.report.num_rows,
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    from pynomaly_ray.pipelines.queries import ORACLE_QUERIES

    timings = {}
    for name, (fn, _sql) in ORACLE_QUERIES.items():
        t0 = time.perf_counter()
        res = fn(sf_dir)
        # consume lazily-built results
        if hasattr(res, "to_pandas"):
            res.to_pandas() if not hasattr(res, "materialize") else res.materialize()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def single_run() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(os.path.normpath(sf_dir))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    headline = run_headline(sf_name)
    queries = run_queries(sf_dir)

    out = {
        "metric": "validation pipeline wall time (synthesized sequence table)",
        "value": round(headline["seconds"], 3),
        "unit": "sec",
        "sequences": headline["sequences"],
        "sequences_per_sec": round(headline["sequences_per_sec"], 1),
        "partitions": headline["partitions"],
        "queries": queries,
        "sf": sf_name,
        "num_cpus": num_cpus,
    }
    ray.shutdown()
    return out


def scaling_run() -> dict:
    """Same job, same input, fresh processes at 8 vs 32 CPUs — the sandbox
    stand-in for N vs 4N cluster nodes (BASELINE.md)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    thr_lo = lo["sequences_per_sec"]
    thr_hi = hi["sequences_per_sec"]
    eff = (thr_hi / thr_lo) / (32 / 8)
    return {
        "metric": "scaling efficiency (8 -> 32 cpus, fresh processes)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "seq_per_sec_8cpu": round(thr_lo, 1),
        "seq_per_sec_32cpu": round(thr_hi, 1),
        "sec_8cpu": lo["value"],
        "sec_32cpu": hi["value"],
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(scaling_run()))
    else:
        print(json.dumps(single_run()))
