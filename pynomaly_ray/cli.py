"""CLI entry point — the `ray job submit` surface of the engine.

    ray job submit -- python -m pynomaly_ray.cli validate \
        --input /data/sequences --out /data/validated \
        --sources web,books,code,wiki --n-neighbors 10 --extent 3

    python -m pynomaly_ray.cli gen --out /tmp/seq --parts 16 --rows 256

Owns the Ray session (guarded init), unlike the library code which
never calls ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus=None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_validate(args) -> int:
    ray = _ensure_ray(args.num_cpus)
    from pynomaly_ray.config import ValidationConfig
    from pynomaly_ray.pipelines.validation import (
        run_validation,
        sequence_dataset_from_dir,
    )

    cfg = ValidationConfig(
        valid_sources=args.sources.split(",") if args.sources else None,
        n_neighbors=args.n_neighbors,
        extent=args.extent,
        drift_threshold=args.drift_threshold,
        cluster_by_source=args.cluster_by_source,
        run_id=args.run_id,
    )
    res = run_validation(
        sequence_dataset_from_dir(args.input),
        cfg,
        out_dir=args.out,
        resume=not args.no_resume,
        collect_violations=args.write_validated,
        frozen_model=args.model,
    )
    if args.write_validated and args.out:
        from pynomaly_ray.pipelines.validation import write_validated_output

        write_validated_output(
            sequence_dataset_from_dir(args.input),
            res.violations.to_pandas(),
            args.out,
            cfg.run_id,
        )
    rep = res.report.to_pandas()
    summary = {
        "partitions": int(len(rep)),
        "passed": int((rep["status"] == "pass").sum()),
        "failed": int((rep["status"] == "fail").sum()),
        "violations": int(rep["n_violations"].sum()),
        "sequences": res.n_sequences,
        "skipped_partitions": res.skipped_partitions,
        "out_dir": res.out_dir,
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 1 if summary["failed"] else 0


def cmd_gen(args) -> int:
    from pynomaly_ray.sources.datagen import GenSpec, generate_dataset_dir

    spec = GenSpec(
        parts_per_source=args.parts,
        rows_per_part=args.rows,
        seed=args.seed,
        plant_violations=not args.clean,
    )
    out = generate_dataset_dir(args.out, spec, force=args.force)
    print(json.dumps({"out": out, "partitions": len(spec.sources) * args.parts}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pynomaly_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="run the validation pipeline")
    v.add_argument("--input", required=True, help="sequence-table parquet dir")
    v.add_argument("--out", default=None, help="output/checkpoint dir")
    v.add_argument("--sources", default=None, help="comma-separated source universe")
    v.add_argument("--n-neighbors", type=int, default=10)
    v.add_argument("--extent", type=int, default=3)
    v.add_argument("--drift-threshold", type=float, default=0.5)
    v.add_argument("--cluster-by-source", action="store_true")
    v.add_argument("--run-id", default="r0")
    v.add_argument("--no-resume", action="store_true")
    v.add_argument(
        "--model",
        default=None,
        help="frozen LoOP model (.npz) for incremental scoring instead of a refit",
    )
    v.add_argument(
        "--write-validated",
        action="store_true",
        help="also write violation-free rows as partitioned parquet",
    )
    v.add_argument("--num-cpus", type=int, default=None)
    v.set_defaults(fn=cmd_validate)

    g = sub.add_parser("gen", help="generate a synthetic sequence table")
    g.add_argument("--out", required=True)
    g.add_argument("--parts", type=int, default=16)
    g.add_argument("--rows", type=int, default=256)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--clean", action="store_true", help="no planted violations")
    g.add_argument("--force", action="store_true")
    g.set_defaults(fn=cmd_gen)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
