"""A/B: chained-projection vs Arrow BPE ENCODE kernels across merge-table
depth (round-11 verdict ask #1's measurement).

For each k, trains the one-pass top-k merge table once (shared, untimed),
then times each kernel separately:
  - plan_s  — DataFrame construction time (py4j builder chains + analysis
              trigger via schema access); the chained kernel's cost here
              grows linearly in k, the Arrow kernel's is constant.
  - wall_s  — noop-sink execution wall (bench.py discipline, min of reps).

Usage:
  python tools/ab_bpe_encode.py [k ...]        # default 4 64 1024
  SPARK_GRAFT_AB_CHAIN_MAX=1024 ...            # run chained above k=256
                                               # (default 256: the chained
                                               # kernel THROWS StackOverflowError
                                               # in Catalyst physical planning
                                               # near k~900 — the measured
                                               # round-11 finding; raise only
                                               # to reproduce the crash)

Prints one JSON line per (kernel, k) and a final summary JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [4, 64, 1024]
    chain_max = int(os.environ.get("SPARK_GRAFT_AB_CHAIN_MAX", "256"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))

    from pyspark.sql import functions as F

    from distgrep_spark.functions.textfns import tokens
    from distgrep_spark.operators.bpe import bpe_encode_arrow
    from distgrep_spark.queries.llm import _bpe_step_expr, _bpe_top_merges
    from distgrep_spark.session import get_spark
    from distgrep_spark.sources.catalog import load_table

    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    # warm the scan + noop sink so kernel walls aren't billed init cost
    toks.write.format("noop").mode("overwrite").save()

    def build_chained(merges):
        cur = toks.selectExpr(
            "doc_id", "CAST(size(t) AS BIGINT) AS n_raw", "t"
        )
        for a, b in merges:
            cur = cur.selectExpr("doc_id", "n_raw", _bpe_step_expr(a, b))
        return cur.selectExpr(
            "doc_id",
            "n_raw",
            "CAST(size(t) AS BIGINT) AS n_encoded",
            "n_raw - CAST(size(t) AS BIGINT) AS n_merged",
            "md5(concat_ws(' ', t)) AS encoded_md5",
        )

    rows = []
    for k in ks:
        merges = [(r["a"], r["b"]) for r in _bpe_top_merges(toks, k)]
        kernels = [("arrow", lambda m=merges: bpe_encode_arrow(toks, m))]
        if k <= chain_max:
            kernels.append(("chained", lambda m=merges: build_chained(m)))
        for kernel, build in kernels:
            t0 = time.perf_counter()
            df = build()
            df.schema  # force analysis so plan_s includes analyzer time
            plan_s = round(time.perf_counter() - t0, 3)
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                walls.append(round(time.perf_counter() - t0, 3))
            row = {
                "kernel": kernel,
                "k": k,
                "n_merges": len(merges),
                "plan_s": plan_s,
                "wall_s": min(walls),
                "walls": walls,
                "sf_dir": sf_dir,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"ab": "bpe_encode", "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
