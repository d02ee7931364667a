"""A/B: eager vs lazy localCheckpoint across build-heavy queries.

Every eager localCheckpoint is a dedicated driver-blocking job; the
same materialization can ride the FIRST consuming job instead
(eager=False): identical blocks, identical LogicalRDD plan, one fewer
job dispatch per site. This harness monkeypatches
DataFrame.localCheckpoint to eager=False and interleaves A/B reps of
the named queries in ONE session (same-process interleave = the repo's
A/B discipline; CLAUDE.md bench-variance lesson).

Usage: python tools/ab_lazy_checkpoint.py q1 q2 ...
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import DataFrame

    from distgrep_spark import queries as q
    from distgrep_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_AB_REPS", "3")))
    spark = get_spark("ab-lazy-ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy().count().write.format(
        "noop"
    ).mode("overwrite").save()

    def _warm(batches):
        for b in batches:
            yield b

    slots = spark.sparkContext.defaultParallelism
    spark.range(slots, numPartitions=slots).mapInPandas(_warm, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    orig = DataFrame.localCheckpoint

    def lazy(self, eager=True):  # noqa: ANN001
        return orig(self, eager=False)

    names = sys.argv[1:]
    results: dict[str, dict[str, list[float]]] = {
        n: {"eager": [], "lazy": []} for n in names
    }
    for rep in range(reps):
        for n in names:
            for arm in ("eager", "lazy"):
                DataFrame.localCheckpoint = lazy if arm == "lazy" else orig
                t0 = time.perf_counter()
                q.QUERIES[n](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                results[n][arm].append(round(time.perf_counter() - t0, 3))
                DataFrame.localCheckpoint = orig
                gc.collect()
    for n in names:
        e = sorted(results[n]["eager"])[reps // 2]
        l = sorted(results[n]["lazy"])[reps // 2]
        print(
            f"{n:40s} eager med={e:6.3f} {results[n]['eager']} "
            f"lazy med={l:6.3f} {results[n]['lazy']}  delta={e - l:+.3f}"
        )


if __name__ == "__main__":
    main()
