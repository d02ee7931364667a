"""EXPLAIN every DuckDB oracle and flag cross-product join orders.

The twin-side counterpart of tools/plan_audit.py. Round-8 x64 sweep
finding: when DuckDB INLINES a CTE (its default), the estimated
cardinality of the CTE's output can collapse to ~1 on parquet views
(EC:0 scans), and the join-order optimizer then replaces an EQUI-join
with CROSS_PRODUCT + FILTER — market_basket_lift's twin went from 25 s
(AS MATERIALIZED, hash joins) to >20 min of 20-thread grinding at x64.
EXPLAIN is plan-only (no execution), so auditing all ~330 twins takes
seconds; any CROSS_PRODUCT whose both inputs are plural-row operators
is a latent x64+ time bomb even when small fixtures hide it.

A CROSS_PRODUCT is legitimate when one side is a 1-row aggregate
(scalar-total patterns: `CROSS JOIN n`); those print UNGROUPED_AGGREGATE
or a LIMIT-1 subtree on one input. The audit therefore reports the
operator subtree heads for eyeballing rather than hard-failing.

Usage: python tools/audit_oracle_plans.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
    else os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
)
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> None:
    import duckdb

    from distgrep_spark import queries as q

    names = [a for a in sys.argv[1:] if not os.path.isdir(a)] or list(q.ORACLES)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    flagged = 0
    for name in names:
        sql = q.ORACLES.get(name)
        if sql is None:
            continue
        try:
            plan = con.execute("EXPLAIN " + sql).fetchall()[0][1]
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {str(e).splitlines()[0][:150]}")
            flagged += 1
            continue
        n_cross = plan.count("CROSS_PRODUCT")
        # 1-row scalar-total cross joins are idiomatic; flag only when a
        # cross product's subtree lacks an ungrouped (1-row) aggregate
        # anywhere below it — cheap heuristic: compare counts.
        n_scalar = plan.count("UNGROUPED_AGGREGATE")
        if n_cross > n_scalar:
            print(f"FLAG  {name}: {n_cross} CROSS_PRODUCT vs {n_scalar} scalar aggs")
            flagged += 1
    print(f"\n{flagged} flagged / {len(names)} audited at {SF_DIR}")


if __name__ == "__main__":
    main()
