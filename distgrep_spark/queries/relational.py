"""Relational core: filters, aggregations, joins, sort/top-k, set ops,
scalar functions (SURVEY.md §2.2 rows "Joins" through "Scalar fns").

The reference is a single-table engine; these queries are the planned
engine surface over the TPC-H-ish fixtures. Design rules applied
throughout:

- every computed column aliased identically in Spark and oracle SQL;
- double aggregates use the exact-DECIMAL accumulation discipline
  (``functions.numeric``) so Spark's and DuckDB's summation orders and
  rounding rules cannot flip the driver's value hash; per-row arithmetic
  stays unrounded (identical IEEE expression trees are bit-identical);
- small dims joined with an explicit ``broadcast()`` hint — at 100 TB the
  fact side never shuffles for these joins;
- no ``orderBy`` unless the query IS a top-k (global sorts are paid only
  when semantics require them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distgrep_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from distgrep_spark.queries.registry import query
from distgrep_spark.sources.catalog import load_table


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical scan→filter→
    partial-agg→exchange→final-agg pipeline. At 100 TB this is one wide
    stage whose shuffle carries only 6 group rows per map partition."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle=f"""
    SELECT event_type,
           count(*)                AS n_events,
           count(DISTINCT user_id) AS n_users,
           {sql_dsum("value", "total_value")}
    FROM events
    GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count: Catalyst plans expand+two-phase aggregation.
    (The approx/HLL variant is ``agg_approx_distinct`` — rows-only check.)"""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        dsum("value", "total_value"),
    )


@query("agg_approx_distinct")  # no oracle: HLL estimates are engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): at 100 TB the exact distinct
    of a high-cardinality key shuffles every value; the sketch shuffles a
    fixed-size buffer per partition. rows-only driver check; pytest bounds
    the estimate against the exact count at ±5 %."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users")
    )


@query(
    "agg_approx_distinct_error",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users, TRUE AS err_ok
    FROM events GROUP BY event_type
    """,
)
def agg_approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-oracled error gate for the HLL sketch: per group, the exact
    distinct count (DuckDB-derivable) plus an asserted <=5% relative
    error of approx_count_distinct against it. The HLL register state is
    a per-value max, so the estimate is insertion-order- and
    partition-layout-independent — a deterministic number on a fixed
    corpus (measured exact at rsd=0.01, sf0.01). A FALSE row fails the
    driver's hash gate.

    Round 11: both aggregates run over the DISTINCT (event_type,
    user_id) rollup instead of the raw facts. Mixing count_distinct
    with a non-distinct aggregate plans an Expand that doubles every
    fact row into the exchange; deduplicating first is a map-side-
    combined single exchange, and both results are provably unchanged —
    count over distinct pairs IS count_distinct, and HLL registers are
    per-value maxima, so duplicate inputs are no-ops (the
    additive-sketches-from-the-key-rollup lesson). Plan: Expand gone,
    2x fact rows -> 1x distinct pairs shuffled."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select("event_type", "user_id").distinct()
    both = pairs.groupBy("event_type").agg(
        F.count("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", 0.01).alias("_approx"),
    )
    return both.select(
        "event_type",
        "n_users",
        (
            F.abs(F.col("_approx") - F.col("n_users"))
            <= F.lit(0.05) * F.col("n_users")
        ).alias("err_ok"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, {sql_dsum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchy subtotals in one pass (Expand → single shuffle),
    not one job per grouping level."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty")
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, {sql_dsum("o_totalprice", "total")}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (the DataFrame API has no direct
    grouping-sets verb; spark.sql is the idiomatic spelling)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_broadcast_dim",
    oracle=f"""
    SELECT p.p_brand,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dim with an explicit broadcast hint: zero shuffle of
    the fact table; the only exchange is the final 25-row aggregation.
    At 100 TB `part` (bounded in the millions) still broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_shuffle_fact",
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           {sql_dsum("l.l_extendedprice", "total_price")}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_shuffle_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ fact on the FK: both sides shuffle on l_orderkey/o_orderkey
    (sort-merge at scale; AQE may downgrade to broadcast at small SF).
    This is the join whose key distribution matters most at 100 TB —
    o_orderkey is near-uniform, so no salting needed here."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice", "total_price"),
        )
    )


@query(
    "join_multiway",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way join. nation/region broadcast (bounded
    cardinality forever); customer⋈orders⋈lineitem shuffle on their keys;
    Catalyst pushes r_name='ASIA' below the joins so the customer side is
    pre-filtered before any exchange."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: existence check without row multiplication — the
    right side deduplicates before the probe, so output ≤ left input."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no URGENT-priority orders (NOT IN
    with non-null keys). The subtracted side is restricted to
    ``o_orderpriority = '1-URGENT'`` so the anti set is NON-EMPTY at
    every fixture SF (measured: 18 / 203 / 1986 rows at sf0.001/0.01/
    0.1) — the unrestricted form returned 0 rows at sf0.01 (every
    customer has some order), which certified only that both engines
    agree on empty (round-3 verdict: a vacuous oracle). The filter is
    pushed into the build side before the anti join, so at 100 TB the
    hash set carries only the urgent subset's keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_outer",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS n_orders,
           coalesce({sql_dsum("o.o_totalprice", "x").replace(" AS x", "")}, 0) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + aggregate: null-extension semantics (count skips
    nulls; sum coalesced to 0 for order-less customers)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


@query(
    "join_range",
    # Round 6 (verdict ask #3): the oracle is now its own 100-TB form —
    # the same order-statistic the engine computes, as plain SQL: union
    # both sides, one running count of customer rows ordered by
    # (balance, customers-first-at-ties so equality counts as <=), and
    # n_richer = |C| - n_le at each supplier row. O((|S|+|C|) log) with
    # NO pair set; the previous form materialized the |S|x|richer-C|
    # pair set (~2e9 rows at x16) before its GROUP BY. Equality of the
    # two forms is pinned by tests/test_oracle_twins.py against the
    # brute-force SQL at sf0.01. The >0 filter reproduces the INNER
    # join's drop of suppliers with no richer customer.
    oracle="""
    WITH u AS (
      SELECT c_acctbal AS v, 1 AS is_c,
             NULL::BIGINT AS sk, NULL::VARCHAR AS sn FROM customer
      UNION ALL
      SELECT s_acctbal, 0, s_suppkey, s_name FROM supplier
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM customer),
    r AS (
      SELECT sk, sn, is_c,
             CAST(sum(is_c) OVER (ORDER BY v, is_c DESC
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_le
      FROM u
    )
    SELECT sk AS s_suppkey, sn AS s_name, nc - n_le AS n_richer_customers
    FROM r CROSS JOIN tot
    WHERE is_c = 0 AND nc - n_le > 0
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join, computed the way a 100 TB run must:
    count-greater as a distributed ORDER STATISTIC
    (operators/rangejoin.py, round 5) — equi-depth buckets over the
    union of both sides, a per-bucket running count of value rows, and
    ``n_greater = |V| - n_le`` map-side. No pair residual at all: any
    same-bucket compare-join is quadratic under densification (the
    x16-soak 3.9x tail; the first equi-depth attempt measured 11x), and
    a raw theta join plans the |S|x|C| BroadcastNestedLoopJoin. The
    quadratic formulation survives as the explicitly-bounded demo entry
    ``join_range_theta`` (queries/extras.py) with this same oracle."""
    from distgrep_spark.operators.rangejoin import count_greater_join

    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return count_greater_join(
        s,
        c,
        probe_col="s_acctbal",
        value_col="c_acctbal",
        keys=["s_suppkey", "s_name"],
    ).withColumnRenamed("n_greater", "n_richer_customers")


# ---------------------------------------------------------------------------
# Sort / top-k / set ops
# ---------------------------------------------------------------------------


@query(
    "topk_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, {sql_dsum("o.o_totalprice", "total_spent")}
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY total_spent DESC, c_custkey
    LIMIT 10
    """,
)
def topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k = orderBy().limit(k): Spark plans TakeOrderedAndProject —
    each partition keeps its local top-10, the driver merges k*P rows; no
    global sort ever materializes. Tie-broken on c_custkey for determinism."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dsum("o_totalprice", "total_spent"))
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey"))
        .limit(10)
    )


@query(
    "sort_global",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort (range-partitioned exchange + per-partition sort).
    Kept on the small `part` table: at 100 TB you top-k or bucket instead."""
    return (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    )


@query(
    "set_union_intersect_except",
    oracle="""
    WITH big_spenders AS (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    ),
    machinery AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    )
    SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM big_spenders UNION SELECT c_custkey FROM machinery)
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM big_spenders INTERSECT SELECT c_custkey FROM machinery)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM big_spenders EXCEPT SELECT c_custkey FROM machinery)
    """,
)
def set_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) / INTERSECT / EXCEPT over two keyed views, tagged
    and stacked so one query exercises all three set operators.

    Round 11: both input views are lazily checkpointed at their fan-out
    — each feeds all three set operators, and Spark reuses no exchange
    across branches, so the un-checkpointed form scanned each table 3x
    and ran big's distinct exchange 3x (plan: 6 scans -> 0). Walls flat
    at sf0.1 (floor-bound); at 100 TB this is two saved full scans plus
    two saved distinct shuffles."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        o.where(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    mach = (
        c.where(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey")
        .localCheckpoint(eager=False)
    )
    return (
        big.union(mach).distinct().select(F.lit("union").alias("op"), "c_custkey")
        .unionAll(big.intersect(mach).select(F.lit("intersect").alias("op"), "c_custkey"))
        .unionAll(big.exceptAll(mach).distinct().select(F.lit("except").alias("op"), "c_custkey"))
    )


# ---------------------------------------------------------------------------
# Scalar functions: string / date / math / json
# ---------------------------------------------------------------------------


@query(
    "scalar_string_fns",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                          AS name_upper,
           length(p_name)                         AS name_len,
           substring(p_name, 1, 3)                AS name_prefix,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           concat_ws('|', p_brand, p_type)        AS brand_type,
           strpos(p_name, 'e')                    AS first_e
    FROM part
    """,
)
def scalar_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery: all JVM built-ins, whole-stage-codegen'd —
    no Python in the row path."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 3).alias("name_prefix"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.instr(F.col("p_name"), "e").alias("first_e"),
    )


@query(
    "scalar_date_fns",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           year(o_orderdate)    AS order_year,
           quarter(o_orderdate) AS order_quarter,
           count(*)             AS n_orders,
           {sql_dsum("o_totalprice", "total")}
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY 1, 2, 3
    """,
)
def scalar_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp truncation + parts; the month-truncated group key is what
    a partitioned lake would prune on."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total"),
        )
    )


@query(
    "scalar_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           round(sqrt(l_quantity), 4)    AS qty_sqrt,
           round(ln(l_extendedprice), 4) AS price_ln,
           abs(l_discount - 0.05)        AS disc_dev,
           CAST(ceil(l_quantity / 10.0) AS BIGINT) AS qty_bucket,
           l_quantity % 7                AS qty_mod
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def scalar_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery: arithmetic, sqrt/ln, abs, ceil, modulo. `charge` is
    deliberately unrounded — the identical IEEE expression tree is
    bit-identical across engines, while round() half-rules are not."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "charge"
        ),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 10.0).alias("qty_bucket"),
        (F.col("l_quantity") % 7).alias("qty_mod"),
    )


@query(
    "json_extract_events",
    oracle=f"""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           count(*) AS n,
           {sql_dsum("value", "total_value")}
    FROM events
    GROUP BY 1
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the events.props JSON-string column (the
    semi-structured path: extract → cast → aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("bigint").alias("k"), F.col("value"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
    )


@query(
    "from_json_struct",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    """,
)
def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema → typed struct column; the filter
    on the parsed field happens JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k BIGINT"))
    return parsed.where(F.col("p.k") > 90).select("event_id", F.col("p.k").alias("k"))


@query(
    "conditional_case",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           o_orderstatus,
           count(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding + group (when/otherwise chain)."""
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    return o.groupBy(band.alias("price_band"), F.col("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_totalprice BETWEEN 100000 AND 200000
      AND o_orderpriority LIKE '1-%'
      AND o_custkey IS NOT NULL
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate battery: equality, BETWEEN, LIKE prefix, null check —
    all pushed to the parquet scan (asserted in tests/test_plans.py)."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderstatus") == "O")
        & F.col("o_totalprice").between(100000, 200000)
        & F.col("o_orderpriority").like("1-%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join with selective filters on BOTH outer
    tables, then top-10 by aggregated revenue. Catalyst broadcasts the
    filtered customer side and the date filters reach both scans; the
    final top-k is TakeOrderedAndProject, not a global sort."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way snowflake join with the local-supplier
    constraint (customer and supplier in the SAME nation) — the join
    graph where order matters most. The three dimension tables broadcast;
    only fact-fact edges shuffle."""
    start = F.lit("1996-01-01").cast("timestamp")
    end = F.lit("1998-01-01").cast("timestamp")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= start) & (F.col("o_orderdate") < end)
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", "revenue")},
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate — every predicate
    pushes to parquet, no shuffle beyond the single global aggregate.
    The query whole-stage codegen should collapse to one stage."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter —
    fact-fact join narrowed by quarter + returnflag, customer/nation
    broadcast, top-20 via TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q18_large_orders",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           {sql_dsum("l_quantity", "total_qty")}
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over an AGGREGATED table (orders
    whose total quantity clears a threshold) — the aggregate-then-semi
    -join pattern. The HAVING side reduces lineitem to qualifying keys
    BEFORE the join, so the semi join probes a small build side instead
    of re-aggregating inside the join."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("tq"))
        .where(F.col("tq") > 300)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").join(
        broadcast(big), F.col("o_orderkey") == big["l_orderkey"], "left_semi"
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(dsum("l_quantity", "total_qty"))
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: aggregate OF an aggregate over an outer join
    with a join-condition filter (not a WHERE — customers with zero
    qualifying orders must survive with count 0). count(col) vs
    count(*) matters: the outer join's null o_orderkey rows count as 0."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "json_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(NULL AS BIGINT) AS missing,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: ``parse_json``
    converts the JSON text to the binary VARIANT encoding ONCE, then
    ``variant_get`` extracts typed fields from the binary form and
    ``try_variant_get`` returns NULL (not an error) for missing paths —
    ANSI-safe schema drift handling. At 100 TB this is the
    parse-once/extract-many contract: get_json_object re-parses the
    TEXT per path expression, while a VARIANT column parsed at ingest
    (or stored as VARIANT in parquet) amortizes parsing across every
    downstream extraction; shredded storage then pushes typed paths
    into the scan. The oracle speaks DuckDB's JSON dialect — same typed
    values, so the driver hash certifies the VARIANT decode
    end-to-end."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.withColumn("v", F.parse_json("props"))
    return (
        v.select(
            "event_id",
            F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
            F.expr("try_variant_get(v, '$.does_not_exist', 'bigint')").alias("missing"),
            (F.expr("variant_get(v, '$.k', 'bigint')") % 7).alias("k_mod"),
        )
        .where(F.col("k").isNotNull())
    )


# ---------------------------------------------------------------------------
# Round-3 batch 14: scalar/aggregate surface batteries + LATERAL subquery
# ---------------------------------------------------------------------------


@query(
    "scalar_bitwise_fns",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT)      AS band,
           CAST(o_orderkey | 4096 AS BIGINT)     AS bor,
           CAST(xor(o_orderkey, 1365) AS BIGINT) AS bxor,
           CAST(o_orderkey << 3 AS BIGINT)       AS shl,
           CAST(o_orderkey >> 2 AS BIGINT)       AS shr,
           CAST(bit_count(o_orderkey) AS INT)    AS popcnt,
           CAST(~o_orderkey AS BIGINT)           AS bnot
    FROM orders WHERE o_orderkey < 1000
    """,
)
def q_scalar_bitwise_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface battery: and/or/xor/shifts/popcount/not —
    the primitives every sketch in this engine builds on (simhash lane
    packing, bitmap-distinct words, LSH band keys), certified as
    user-facing scalars. Dialect note: Spark spells xor ``^`` and
    DuckDB spells it ``xor()`` (``^`` is power there), so the sides are
    written separately — the CLAUDE.md no-verbatim-sharing rule for
    operator dialects. Map-side, pushdown-filtered."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.where("o_orderkey < 1000").selectExpr(
        "o_orderkey",
        "CAST(o_orderkey & 255 AS BIGINT)    AS band",
        "CAST(o_orderkey | 4096 AS BIGINT)   AS bor",
        "CAST(o_orderkey ^ 1365 AS BIGINT)   AS bxor",
        "CAST(shiftleft(o_orderkey, 3) AS BIGINT)  AS shl",
        "CAST(shiftright(o_orderkey, 2) AS BIGINT) AS shr",
        "CAST(bit_count(o_orderkey) AS INT)  AS popcnt",
        "CAST(~o_orderkey AS BIGINT)         AS bnot",
    )


@query(
    "agg_boolean_fns",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000.0)   AS all_over_1k,
           bool_or(o_totalprice > 400000.0)  AS any_over_400k,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(count(*) AS BIGINT)          AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_boolean_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-aggregate surface battery: every/any (bool_and/bool_or)
    and count_if — the predicates-as-aggregates family used by the DQ
    report queries, certified standalone. Comparisons sit on DOUBLE
    fixture values against round constants far from any data point
    (fixture min/max are 900.68/499993.18), so the booleans are not on
    a knife edge. One map-side-combined exchange, five rows."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("every(o_totalprice > 1000.0D)   AS all_over_1k"),
        F.expr("any(o_totalprice > 400000.0D)   AS any_over_400k"),
        F.expr("CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished"),
        F.expr("CAST(count(*) AS BIGINT)        AS n"),
    )


@query(
    "join_lateral_topn",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.cents, t.rnk
    FROM customer c,
    LATERAL (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
               AS rnk
      FROM orders WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_custkey < 50
    """,
)
def q_join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 orders per customer for a
    50-customer panel — certifies the LATERAL join surface (the
    SQL-standard correlated table expression Spark supports since 3.2;
    Catalyst decorrelates it to a ranked join rather than executing
    per-row subqueries, which is exactly the rewrite you rely on at
    100 TB: a naive per-customer loop would be 10^9 subqueries). The
    deterministic (price DESC, orderkey) tie-break makes top-2 a total
    function of the data. Contrast window_topk_per_group, which writes
    the ranked-join form by hand — here the ENGINE must find it."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    orders.createOrReplaceTempView("lat_orders")
    cust.createOrReplaceTempView("lat_customer")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.cents, t.rnk
        FROM lat_customer c,
        LATERAL (
          SELECT o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                 row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                   AS rnk
          FROM lat_orders WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey < 50
        """
    )


@query(
    "set_ops_bag_semantics",
    oracle="""
    WITH a AS (SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'),
    b AS (SELECT l_partkey AS k FROM lineitem WHERE l_linestatus = 'F'),
    i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
    e AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    SELECT 'intersect_all' AS op, k, CAST(count(*) AS BIGINT) AS multiplicity
    FROM i GROUP BY k
    UNION ALL
    SELECT 'except_all' AS op, k, CAST(count(*) AS BIGINT) AS multiplicity
    FROM e GROUP BY k
    """,
)
def q_set_ops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — bag (multiset) semantics, the SQL
    surface the distinct-flavored set_union_intersect_except can't
    certify: multiplicities are min(m_a, m_b) and max(m_a - m_b, 0)
    per key, which matters whenever dedup must NOT happen (billing
    reconciliation, event-stream diffs). Spark plans these as
    count-annotated aggregates + a generator — no row explosion
    beyond the answer. The result is rolled up per key so the driver
    compares (op, key, multiplicity) scalars."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where("l_returnflag = 'R'").selectExpr("l_partkey AS k")
    b = li.where("l_linestatus = 'F'").selectExpr("l_partkey AS k")
    i = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.expr("CAST(count(*) AS BIGINT) AS multiplicity"))
        .selectExpr("'intersect_all' AS op", "k", "multiplicity")
    )
    e = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.expr("CAST(count(*) AS BIGINT) AS multiplicity"))
        .selectExpr("'except_all' AS op", "k", "multiplicity")
    )
    return i.unionAll(e)


@query(
    "scalar_null_fns",
    oracle="""
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING')                  AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'N/A') AS seg_filled,
           CAST(coalesce(nullif(c_nationkey, 0), -1) AS INT) AS nation_or_neg,
           (c_acctbal IS NULL)                               AS bal_is_null,
           CASE WHEN isnan(c_acctbal / nullif(c_nationkey, c_nationkey))
                THEN NULL ELSE c_acctbal END IS NULL         AS nan_guard_null
    FROM customer WHERE c_custkey < 200
    """,
)
def q_scalar_null_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalar battery: nullif / coalesce chains, IS NULL
    projection, and a NaN guard (nanvl family) — three-valued logic as
    user-facing surface. ``c_acctbal / nullif(x, x)`` manufactures a
    NULL divisor (never a zero divisor — ANSI mode throws on those, so
    the NULL path is also the SAFE path and the idiom this engine's
    try_arithmetic battery recommends). Map-side, pushdown-filtered;
    every output is deterministic because no float arithmetic survives
    to the comparison (the division's result is discarded through
    IS NULL)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.where("c_custkey < 200").selectExpr(
        "c_custkey",
        "nullif(c_mktsegment, 'BUILDING')                  AS seg_or_null",
        "coalesce(nullif(c_mktsegment, 'BUILDING'), 'N/A') AS seg_filled",
        "CAST(coalesce(nullif(c_nationkey, 0), -1) AS INT) AS nation_or_neg",
        "(c_acctbal IS NULL)                               AS bal_is_null",
        "CASE WHEN isnan(c_acctbal / nullif(c_nationkey, c_nationkey))"
        " THEN NULL ELSE c_acctbal END IS NULL             AS nan_guard_null",
    )


@query(
    "scalar_url_parse",
    oracle=r"""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&ref=home'
               AS url
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id, url,
           regexp_extract(url, '^([a-z]+)://', 1)           AS proto,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1)      AS host,
           regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, '\?(.*)$', 1)                AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1)       AS lang_param
    FROM u
    """,
)
def q_scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition battery: Spark's ``parse_url`` (PROTOCOL /
    HOST / PATH / QUERY and per-key QUERY extraction — the
    clickstream-normalization workhorse) certified against a
    first-principles regex oracle (DuckDB has no parse_url; the twin
    rebuilds each component with anchored Java∩RE2 patterns, so the
    check is two INDEPENDENT implementations agreeing, not one
    function tested against itself). URLs are derived deterministically
    from fixture columns — no synthesized corpus. Map-side,
    pushdown-filtered. The sample is a MODULO cut (doc_id % 5 = 0),
    not an absolute id literal: an absolute bound silently empties on
    a key-shifted corpus (the round-5 dedup_simhash_exactdup lesson),
    while the modulo keeps a fixed fraction alive at any keyspace
    (doc_ids are non-negative, so % agrees cross-engine)."""
    docs = load_table(spark, sf_dir, "documents")
    u = docs.where("doc_id % 5 = 0").selectExpr(
        "doc_id",
        "concat('https://', source, '.example.com/docs/',"
        " CAST(doc_id AS STRING), '?lang=', lang, '&ref=home') AS url",
    )
    return u.selectExpr(
        "doc_id",
        "url",
        "parse_url(url, 'PROTOCOL')      AS proto",
        "parse_url(url, 'HOST')          AS host",
        "parse_url(url, 'PATH')          AS path",
        "parse_url(url, 'QUERY')         AS query",
        "parse_url(url, 'QUERY', 'lang') AS lang_param",
    )


@query(
    "agg_argminmax_fns",
    oracle="""
    WITH o AS (
      SELECT o_orderpriority,
             o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 1000000000
               + o_orderkey AS price_key
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(arg_max(o_orderkey, price_key) AS BIGINT) AS top_order,
           CAST(arg_min(o_orderkey, price_key) AS BIGINT) AS bottom_order,
           CAST(max(price_key) // 1000000000 AS BIGINT) AS top_cents,
           CAST(min(price_key) // 1000000000 AS BIGINT) AS bottom_cents
    FROM o GROUP BY o_orderpriority
    """,
)
def q_agg_argminmax_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in argmax/argmin aggregates (Spark ``max_by``/``min_by``,
    DuckDB ``arg_max``/``arg_min``) — the function surface behind
    'which order was the most expensive', certified with the
    engine-exact tie-break discipline this repo applies to every
    hand-rolled argmax (embed_pq_assign, window_max_drawdown): the
    ordering key packs cents and the unique orderkey into one BIGINT
    (``cents·1e9 + key``), so ties are impossible BY CONSTRUCTION
    rather than left to the engines' unspecified tie behavior, which
    differs and would flip the hash. Injectivity precondition:
    ``o_orderkey < 1e9``, which holds through ~sf160 (TPC-H orderkeys
    reach ~6e6·sf); cents ≤ 6e7 keeps the product ≤ 6e16, inside
    BIGINT with 150× headroom. (Round-3 ADVICE: the old 1e7 multiplier
    silently broke injectivity past ~sf1.6.) One map-side-combinable
    exchange, five rows."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.selectExpr(
        "o_orderpriority",
        "o_orderkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 1000000000"
        " + o_orderkey AS price_key",
    )
    return o.groupBy("o_orderpriority").agg(
        F.expr("CAST(max_by(o_orderkey, price_key) AS BIGINT) AS top_order"),
        F.expr("CAST(min_by(o_orderkey, price_key) AS BIGINT) AS bottom_order"),
        F.expr("CAST(max(price_key) DIV 1000000000 AS BIGINT) AS top_cents"),
        F.expr("CAST(min(price_key) DIV 1000000000 AS BIGINT) AS bottom_cents"),
    )


# ---------------------------------------------------------------------------
# Spark 4 collation surface (case-insensitive comparison semantics)
# ---------------------------------------------------------------------------


@query(
    "scalar_collation_fns",
    oracle="""
    WITH b AS (
      SELECT
        CASE WHEN lower(c_mktsegment) = lower(lower(c_mktsegment))
             THEN 1 ELSE 0 END AS eq_ci,
        CASE WHEN starts_with(lower(c_name), 'customer')
             THEN 1 ELSE 0 END AS sw_ci,
        CASE WHEN lower(c_mktsegment) IN
                  ('automobile', 'building', 'furniture',
                   'household', 'machinery')
             THEN 1 ELSE 0 END AS in_ci,
        CASE WHEN lower(c_mktsegment) = 'zzz' THEN 1 ELSE 0 END AS neg_ci
      FROM customer
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(eq_ci) AS BIGINT) AS n_eq_ci,
           CAST(sum(sw_ci) AS BIGINT) AS n_startswith_ci,
           CAST(sum(in_ci) AS BIGINT) AS n_in_ci,
           CAST(sum(neg_ci) AS BIGINT) AS n_negative
    FROM b
    """,
)
def q_scalar_collation_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION surface: comparisons, ``startswith``, and
    IN-lists under ``UTF8_LCASE`` — the engine-level case-insensitive
    semantics that replace scattered ``lower()`` calls (and, at 100 TB,
    matter because a collated comparison keeps the ORIGINAL column
    bytes flowing — no derived lowercase column to widen the shuffle,
    and data-source stats on the original column stay usable).

    The DuckDB twin normalizes with ``lower()`` — the certificate is
    that Spark's collated operators agree with explicit normalization
    on every row: the uppercase segment equals its lowercase form
    under UTF8_LCASE, 'Customer#...' starts with 'customer', the
    uppercase segment hits an all-lowercase IN-list, and the negative
    control stays 0. All counts exact BIGINTs off one map-side
    rollup; if any collated operator regressed, its count drops below
    n_rows and the value hash breaks."""
    cust = load_table(spark, sf_dir, "customer")
    b = cust.selectExpr(
        "CASE WHEN (c_mktsegment COLLATE UTF8_LCASE) = lower(c_mktsegment)"
        " THEN 1 ELSE 0 END AS eq_ci",
        "CASE WHEN startswith(c_name COLLATE UTF8_LCASE, 'customer')"
        " THEN 1 ELSE 0 END AS sw_ci",
        "CASE WHEN (c_mktsegment COLLATE UTF8_LCASE) IN"
        " ('automobile', 'building', 'furniture',"
        " 'household', 'machinery') THEN 1 ELSE 0 END AS in_ci",
        "CASE WHEN (c_mktsegment COLLATE UTF8_LCASE) = 'zzz'"
        " THEN 1 ELSE 0 END AS neg_ci",
    )
    return b.agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_rows"),
        F.expr("CAST(sum(eq_ci) AS BIGINT) AS n_eq_ci"),
        F.expr("CAST(sum(sw_ci) AS BIGINT) AS n_startswith_ci"),
        F.expr("CAST(sum(in_ci) AS BIGINT) AS n_in_ci"),
        F.expr("CAST(sum(neg_ci) AS BIGINT) AS n_negative"),
    )


# ---------------------------------------------------------------------------
# Spark 4 SQL-surface battery: pipe syntax, IDENTIFIER, parameter markers
# ---------------------------------------------------------------------------


@query(
    "sql_pipe_syntax_battery",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_dsum("o_totalprice", "revenue")}
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 150000
    GROUP BY c_mktsegment
    """,
)
def q_sql_pipe_syntax_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-surface battery in ONE statement: pipe syntax
    (``FROM ... |> WHERE |> JOIN |> AGGREGATE`` — SQL written in
    dataflow order, the 4.0 surface), the ``IDENTIFIER()`` clause
    (parameterized table names — the injection-safe dynamic-SQL seam),
    and named parameter markers (``:threshold`` bound via
    ``spark.sql(args=...)`` — plan-cacheable constants instead of
    string splicing). The oracle is the equivalent classic SELECT, so
    the certificate is that the new syntax surface is pure sugar over
    identical semantics (same rows, same exact-decimal revenue).

    The 100-TB relevance is operational, not physical: Catalyst
    compiles the pipe form to exactly the plan of the classic form
    (broadcast dim join + partial/final aggregate here), while
    IDENTIFIER + parameter markers are what make templated production
    SQL safe to generate — no quoting bugs, no plan-cache misses from
    inlined literals."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "pipe_orders_v"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "pipe_customer_v"
    )
    return spark.sql(
        """
        FROM IDENTIFIER(:ord)
        |> WHERE o_totalprice > :lo
        |> JOIN IDENTIFIER(:cust) ON o_custkey = c_custkey
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_orders,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
                          AS DOUBLE) AS revenue
           GROUP BY c_mktsegment
        |> SELECT c_mktsegment, n_orders, revenue
        """,
        args={"ord": "pipe_orders_v", "cust": "pipe_customer_v", "lo": 150000},
    )


# ---------------------------------------------------------------------------
# Declarative SQL UDFs (scalar + table-valued), certified pure sugar
# ---------------------------------------------------------------------------


@query(
    "sql_udf_battery",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders WHERE o_totalprice > 150000
    GROUP BY o_orderstatus
    """,
)
def q_sql_udf_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 DECLARATIVE SQL UDFs — both kinds in one query: a scalar
    SQL UDF (``sqludf_cents`` — the exact-cents idiom captured once as
    a named function instead of a copy-pasted expression) and a
    TABLE-VALUED SQL UDF (``sqludf_big_orders(lo)`` — a parameterized
    relation), composed and certified pure sugar against the
    inlined-expression oracle. Unlike Python UDFs/UDTFs (the slow
    seam, functions/udtfs.py), SQL UDFs are INLINED by the analyzer
    into the calling plan — whole-stage codegen, predicate pushdown,
    and column pruning all still apply, which is why they are the
    first packaging choice for shared logic at 100 TB; the Python
    seams exist for logic SQL cannot express.

    The function bodies reference the fixture through a temp view and
    take the threshold as a typed parameter — the same
    template-safety story as sql_pipe_syntax_battery's parameter
    markers, one level up."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sqludf_orders_v"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sqludf_cents(x DOUBLE)"
        " RETURNS BIGINT RETURN CAST(floor(x * 100 + 0.5) AS BIGINT)"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION sqludf_big_orders(lo DOUBLE)
        RETURNS TABLE(o_orderstatus STRING, cents BIGINT)
        RETURN SELECT o_orderstatus, sqludf_cents(o_totalprice)
               FROM sqludf_orders_v WHERE o_totalprice > lo
        """
    )
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM sqludf_big_orders(150000.0)
        GROUP BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# SQL reshape clauses: PIVOT / UNPIVOT / GROUP BY ALL (roundtrip certificate)
# ---------------------------------------------------------------------------


@query(
    "sql_reshape_clauses_battery",
    oracle="""
    SELECT o_orderpriority, lower(o_orderstatus) AS status_code,
           CAST(count(*) AS BIGINT) AS n
    FROM orders WHERE o_orderstatus IN ('F', 'O', 'P')
    GROUP BY 1, 2
    """,
)
def q_sql_reshape_clauses_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard reshape CLAUSES (vs the DataFrame pivot/unpivot
    API already covered by pivot_status_totals /
    unpivot_lineitem_metrics): the relational PIVOT clause turns
    status counts into columns, the UNPIVOT clause melts them back,
    and GROUP BY ALL infers the grouping keys on the final rollup —
    three Spark 4 SQL surfaces in one statement whose ROUNDTRIP is the
    certificate: pivot-then-unpivot of the count matrix must equal the
    plain GROUP BY the oracle states (UNPIVOT drops NULL cells by
    default, exactly matching GROUP BY's absent combinations).

    At 100 TB the clause forms compile to the same partial/final
    aggregate + projection plans as the API forms — the surface matters
    because generated BI SQL arrives in clause form and an engine
    claiming SQL compatibility must run it unchanged."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "reshape_orders_v"
    )
    return spark.sql(
        """
        WITH piv AS (
          SELECT * FROM (SELECT o_orderstatus, o_orderpriority
                         FROM reshape_orders_v)
          PIVOT (CAST(count(*) AS BIGINT)
                 FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
        ),
        unp AS (
          SELECT o_orderpriority, status_code, n
          FROM piv UNPIVOT (n FOR status_code IN (f, o, p))
        )
        SELECT o_orderpriority, status_code, CAST(sum(n) AS BIGINT) AS n
        FROM unp GROUP BY ALL
        """
    )


# ---------------------------------------------------------------------------
# Correlated scalar subqueries (decorrelation surface)
# ---------------------------------------------------------------------------


@query(
    "scalar_subquery_correlated",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN n_items IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_empty_orders,
           CAST(sum(coalesce(n_items, 0)) AS BIGINT) AS total_items,
           CAST(max(max_qty) AS BIGINT) AS max_line_qty
    FROM (
      SELECT o.o_orderpriority,
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey) AS n_items_raw,
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
              HAVING count(*) > 0) AS n_items,
             (SELECT CAST(max(l_quantity) AS BIGINT) FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey) AS max_qty
      FROM orders o
    )
    GROUP BY o_orderpriority
    """,
)
def q_scalar_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED SCALAR subqueries — the third decorrelation surface
    beside EXISTS (tpch_q4's semi join) and LATERAL (join_lateral_topn):
    each order row carries per-order aggregates written as inline
    scalar subqueries against the fact table. Catalyst must
    decorrelate these into a grouped aggregate LEFT-joined back on the
    correlation key — the naive per-row re-execution would be O(orders
    x lineitem) and is exactly what an engine claiming SQL support
    must never do (plan shows hash aggregate + outer join, no nested
    loop; orders with no lineitem get NULL scalars, counted here as
    the empty-order class via the HAVING-guarded variant — the
    count-vs-NULL subtlety every decorrelation test suite pins).

    The rollup output keeps the result bounded while the per-row
    scalar semantics are fully exercised; exact BIGINTs throughout."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "css_orders_v"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "css_lineitem_v"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN n_items IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_empty_orders,
               CAST(sum(coalesce(n_items, 0)) AS BIGINT) AS total_items,
               CAST(max(max_qty) AS BIGINT) AS max_line_qty
        FROM (
          SELECT o.o_orderpriority,
                 (SELECT CAST(count(*) AS BIGINT) FROM css_lineitem_v l
                  WHERE l.l_orderkey = o.o_orderkey
                  HAVING count(*) > 0) AS n_items,
                 (SELECT CAST(max(l_quantity) AS BIGINT)
                  FROM css_lineitem_v l
                  WHERE l.l_orderkey = o.o_orderkey) AS max_qty
          FROM css_orders_v o
        )
        GROUP BY o_orderpriority
        """
    )


@query(
    "sql_session_variables_battery",
    oracle="""
    WITH cut AS (
      SELECT CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) // 2 AS cut_cents
      FROM orders
    )
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN CAST(floor(o.o_totalprice * 100 + 0.5)
                                   AS BIGINT) >= c.cut_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           CAST(max(c.cut_cents) AS BIGINT) AS cut_cents
    FROM orders o CROSS JOIN cut c
    GROUP BY o.o_orderpriority
    """,
)
def q_sql_session_variables_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spark 4 SQL session variables + EXECUTE IMMEDIATE + IDENTIFIER —
    the scripting surface batteries (pipe syntax, SQL UDFs, reshape
    clauses) did not yet touch. The flow a parameterized production
    job actually uses: DECLARE OR REPLACE VARIABLE (idempotent per
    session), SET VAR from a scalar subquery (the data-derived
    threshold), then EXECUTE IMMEDIATE over a template whose table
    name arrives via IDENTIFIER(?) and whose predicate parameter binds
    via USING — no string interpolation, no injection surface.

    Exactness: the threshold is half the max order cents (integer DIV
    on both engines — Spark DIV vs DuckDB // agree on non-negative
    operands), so the battery's output is exact BIGINT counts per
    priority plus the threshold itself, proving the variable value that
    flowed through. The DuckDB twin inlines the same scalar subquery
    as a CTE cross join (variables are a Spark-session concept; the
    SEMANTICS are engine-portable). At 100 TB nothing changes: the
    variable is driver-side metadata, the executed plan is one scan +
    one aggregate. Reference: massimostanzione/distgrep client.go:17-21
    (parameterized query ancestor: the grep pattern is the parameter).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sql_vars_orders_v"
    )
    spark.sql(
        "DECLARE OR REPLACE VARIABLE sql_vars_cut_cents BIGINT DEFAULT 0"
    )
    spark.sql(
        """
        SET VAR sql_vars_cut_cents =
          (SELECT CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) DIV 2
           FROM sql_vars_orders_v)
        """
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN CAST(floor(o_totalprice * 100 + 0.5)
                                          AS BIGINT) >= ? THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_big,
                  CAST(? AS BIGINT) AS cut_cents
           FROM IDENTIFIER(?)
           GROUP BY o_orderpriority'
          USING sql_vars_cut_cents, sql_vars_cut_cents, 'sql_vars_orders_v'
        """
    )
