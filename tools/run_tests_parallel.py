"""Parallel pytest runner — round-7 verdict ask #5 (suite-cost hygiene).

pytest-xdist is not in the container, so parallelism is process-level:
split the test FILES into N groups balanced by measured wall cost
(weights below are the round-7 full-run measurement; unknown files get
a default), run one pytest process per group concurrently (each builds
its own session-scoped Spark), and aggregate exit codes. The box runs
local[32] per session, but the suite is latency-bound (driver/py4j
round trips, tiny fixtures), not CPU-bound — measured 584 s serial vs
~180-220 s at N=4 on the same host.

Collision domains checked: Spark UI is disabled in session.get_spark;
streaming checkpoints are time_ns-suffixed; pytest tmp_path is
per-process. Table-writing suites (sinks, bucketing, cli, schema
evolution — they share ./spark-warehouse naming) are PINNED into one
group so cross-process saveAsTable races cannot occur.

Usage:
    python tools/run_tests_parallel.py [n_groups]   # default 4
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Measured per-file wall seconds (round-7 serial run, --durations + file
# timing; contention-noisy but only RELATIVE size matters for balance).
WEIGHTS = {
    "test_empty_inputs.py": 95,
    "test_streaming.py": 60,
    "test_asof_property.py": 45,
    "test_cli.py": 40,
    "test_registry.py": 30,
    "test_sketches_property.py": 25,
    "test_oracle_twins.py": 25,
    "test_plans.py": 25,
    "test_text_property.py": 20,
    "test_rangejoin_property.py": 18,
    "test_spatial_property.py": 14,
    "test_stream_soak_smoke.py": 12,
    "test_grep.py": 12,
    "test_analytics.py": 12,
    "test_synthetic_source.py": 10,
    "test_stats_property.py": 10,
    "test_intervals_property.py": 8,
    "test_distrank_property.py": 8,
    "test_throttle_property.py": 8,
}
DEFAULT_WEIGHT = 6

# Files that write named tables / shared warehouse paths: one group.
PINNED_TOGETHER = {
    "test_sinks.py",
    "test_bucketing.py",
    "test_cli.py",
    "test_schema_evolution.py",
    "test_jsonl_sink.py",
}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    files = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(HERE, "tests", "test_*.py"))
    )
    pinned = [f for f in files if f in PINNED_TOGETHER]
    rest = [f for f in files if f not in PINNED_TOGETHER]
    groups: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    groups[0] = list(pinned)
    loads[0] = sum(WEIGHTS.get(f, DEFAULT_WEIGHT) for f in pinned)
    for f in sorted(rest, key=lambda f: -WEIGHTS.get(f, DEFAULT_WEIGHT)):
        i = loads.index(min(loads))
        groups[i].append(f)
        loads[i] += WEIGHTS.get(f, DEFAULT_WEIGHT)

    t0 = time.time()
    procs = []
    for i, g in enumerate(groups):
        if not g:
            continue
        cmd = [sys.executable, "-m", "pytest", "-q", *(f"tests/{f}" for f in g)]
        logf = open(f"/tmp/pytest_par_{i}.log", "w")
        procs.append((i, g, subprocess.Popen(cmd, cwd=HERE, stdout=logf, stderr=subprocess.STDOUT), logf))
        print(f"# group {i} ({loads[i]:.0f}s est): {' '.join(g)}", flush=True)
    rc = 0
    for i, g, p, logf in procs:
        p.wait()
        logf.close()
        tail = open(f"/tmp/pytest_par_{i}.log").read().strip().splitlines()
        summary = tail[-1] if tail else "(no output)"
        print(f"# group {i} rc={p.returncode}: {summary}", flush=True)
        rc = rc or p.returncode
    print(f"# total wall: {time.time() - t0:.1f}s rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
