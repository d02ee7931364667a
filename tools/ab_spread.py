"""A/B: default vs forced spread=True scans for named queries.

Single-row-group fixtures make every scan ONE task; queries whose
pre-shuffle stage carries real per-row CPU (decimal sums, countDistinct
expand, sketch hashing) serialize on one core. This harness patches
catalog.load_table to force spread=True and interleaves reps in one
session. Blanket spreading is a known net loss (+48% suite, catalog.py
docstring) — this is for finding the few queries where it pays.

Usage: python tools/ab_spread.py q1 q2 ...
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from distgrep_spark import queries as q
    from distgrep_spark.sources import catalog
    from distgrep_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_AB_REPS", "3")))
    spark = get_spark("ab-spread")
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

    orig = catalog.load_table

    def forced(spark, sf_dir, name, *, spread=False):  # noqa: ANN001
        return orig(spark, sf_dir, name, spread=True)

    names = sys.argv[1:]
    results: dict[str, dict[str, list[float]]] = {
        n: {"base": [], "spread": []} for n in names
    }
    # queries modules capture load_table by name at import: patch the
    # catalog attr AND each queries module's global.
    import distgrep_spark.queries as qpkg

    mods = [
        getattr(qpkg, m)
        for m in dir(qpkg)
        if hasattr(getattr(qpkg, m), "load_table")
    ]

    def set_lt(fn):  # noqa: ANN001
        catalog.load_table = fn
        for m in mods:
            m.load_table = fn

    for rep in range(reps):
        for n in names:
            for arm in ("base", "spread"):
                set_lt(forced if arm == "spread" else orig)
                t0 = time.perf_counter()
                q.QUERIES[n](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                results[n][arm].append(round(time.perf_counter() - t0, 3))
                set_lt(orig)
                gc.collect()
    for n in names:
        b = sorted(results[n]["base"])[reps // 2]
        s = sorted(results[n]["spread"])[reps // 2]
        print(
            f"{n:40s} base med={b:6.3f} {results[n]['base']} "
            f"spread med={s:6.3f} {results[n]['spread']}  delta={b - s:+.3f}"
        )


if __name__ == "__main__":
    main()
