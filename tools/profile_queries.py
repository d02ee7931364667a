"""Per-query cost breakdown: driver plan-construction vs execution.

For each named query (default: the 40 slowest in BENCH_FULL.json), measure

  build    — wall to call QUERIES[name](spark, sf_dir) (py4j plan construction,
             any collect()-based codebook pulls, localCheckpoint jobs run HERE)
  exec[k]  — wall of rep k's noop-sink write (codegen JIT lands in exec[0])
  jobs     — Spark jobs triggered during build + one exec (scheduler floor:
             each job is ~10-40 ms of fixed latency at fixture scale)

Usage:  python tools/profile_queries.py [name ...]
Output: one line per query, sorted by median exec, TSV-ish.

The split matters because the optimization levers differ: build-heavy means
py4j/plan cost (use expr strings, from_json literals, fewer chained builders);
exec-heavy at sf0.1 with a flat plan means stage/job-count floors (fewer
shuffles, fewer checkpoint jobs) or Python-boundary cost (Arrow batches).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from distgrep_spark import queries as q
    from distgrep_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3")))
    spark = get_spark("distgrep-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # Same warm-up discipline as bench.py.
    spark.range(1).collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy().count().write.format(
        "noop"
    ).mode("overwrite").save()

    def _warm(batches):
        for b in batches:
            yield b

    slots = sc.defaultParallelism
    spark.range(slots, numPartitions=slots).mapInPandas(_warm, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    names = sys.argv[1:]
    if not names:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        bench = json.load(open(os.path.join(here, "BENCH_FULL.json")))["queries"]
        names = [n for n, _ in sorted(bench.items(), key=lambda kv: -kv[1])[:40]]

    tracker = sc._jsc.sc().statusTracker()
    rows = []
    for name in names:
        if name not in q.QUERIES:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        sc.setJobDescription(f"profile:{name}")
        j0 = len(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        df = q.QUERIES[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        j_build = len(tracker.getJobIdsForGroup(None)) - j0
        execs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
        j_total = len(tracker.getJobIdsForGroup(None)) - j0
        sc.setJobDescription(None)
        gc.collect()
        med = sorted(execs)[len(execs) // 2]
        rows.append(
            dict(
                name=name,
                build=round(t_build, 3),
                build_jobs=j_build,
                exec0=round(execs[0], 3),
                exec_med=round(med, 3),
                exec_min=round(min(execs), 3),
                jobs_per_exec=round((j_total - j_build) / reps, 1),
                total_med=round(t_build + med, 3),
            )
        )
        r = rows[-1]
        print(
            f"{r['total_med']:7.3f} {name:40s} build={r['build']:6.3f} "
            f"(jobs={r['build_jobs']}) exec med={r['exec_med']:6.3f} "
            f"min={r['exec_min']:6.3f} first={r['exec0']:6.3f} "
            f"jobs/exec={r['jobs_per_exec']}",
            file=sys.stderr,
        )

    rows.sort(key=lambda r: -r["total_med"])
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
