"""Dump physical-plan shape stats for every scored-prefix query.

Produces one JSON line per query (and a PLAN_AUDIT.json file) with the
executed-plan operator counts the SCALE.md audits cite — so the audit is
a reproducible artifact, not prose:

    python tools/plan_audit.py            # scored prefix, sf0.01
    python tools/plan_audit.py --all      # every registered query

Metrics per query: hash-partitioning exchanges (shuffles), broadcast
exchanges, sort-merge joins, broadcast-hash joins, nested-loop joins,
and whether the plan contains a cartesian product. Streaming twins and
UDF paths run like any other query — the stats are whatever Catalyst
produced for the batch plan.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distgrep_spark.session import get_spark  # noqa: E402
import distgrep_spark.queries as q  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def audit(plan: str) -> dict:
    return {
        "shuffles": plan.count("Exchange hashpartitioning"),
        "broadcasts": plan.count("BroadcastExchange"),
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": "CartesianProduct" in plan,
        # Re-scan pathology detector: a plan scanning one fixture table
        # many more times than its logic needs usually means branches of
        # a shared subplan are being recomputed (ReusedExchange did not
        # fire) — the round-3 source-overlap-matrix bug class.
        "scans": plan.count("Scan parquet"),
        "reused": plan.count("ReusedExchange"),
    }


def main() -> None:
    names = (
        list(q.QUERIES)
        if "--all" in sys.argv
        else [n for n in entry.SCOREBOARD_PREFIX]
    )
    spark = get_spark("plan-audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        try:
            df = q.QUERIES[name](spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[name] = audit(plan)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e).splitlines()[0][:200]}
        print(json.dumps({name: out[name]}), flush=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "PLAN_AUDIT.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    worst = sorted(
        ((v.get("shuffles", 0), k) for k, v in out.items() if "error" not in v),
        reverse=True,
    )[:5]
    print(f"\n{len(out)} plans audited -> PLAN_AUDIT.json; most shuffles: {worst}")


if __name__ == "__main__":
    main()
