"""bench.py resilience: the driver's record must survive a transient
Ray-level crash mid-run (round 1's official bench was voided by one)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def _run_bench(extra_env: dict) -> tuple[int, dict | None]:
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS="4",
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        **extra_env,
    )
    env.pop("RAY_ADDRESS", None)  # fresh local session in the child
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    parsed = None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
            break
        except (json.JSONDecodeError, ValueError):
            continue
    return proc.returncode, parsed


def test_bench_salvages_headline_when_child_crashes():
    rc, parsed = _run_bench({"PNR_BENCH_CRASH_AFTER_HEADLINE": "1"})
    # both child attempts die right after the headline milestone; the
    # parent must still print a parseable record carrying that headline
    assert parsed is not None
    assert parsed["value"] is not None and parsed["value"] > 0
    assert parsed["unit"] == "sec"
    assert "crash_note" in parsed
    assert rc == 0
