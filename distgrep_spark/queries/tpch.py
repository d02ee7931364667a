"""TPC-H composite shapes, round 2 batch (Q4, Q7, Q14, Q17, Q19, Q21,
Q22), adapted to the fixture schema: the tables carry no
l_commitdate / l_receiptdate / l_shipmode / partsupp, so each query
keeps its STRUCTURAL point (the join/subquery/aggregation shape Catalyst
must plan) with an equivalent predicate over existing columns; the
substitution is noted per query. Dates are TIMESTAMP in the fixtures, so
boundaries are timestamp literals on both engines.

All money aggregates follow the exact-decimal discipline
(functions/numeric.py) so the driver's value hash is
summation-order-independent on both engines.

The 100 TB view: every query here is fact-vs-dimension — dimension sides
(part, supplier, nation, customer at TPC-H scale factors) broadcast, the
lineitem/orders shuffles hash on their join keys, and the semi/anti
EXISTS forms stay semi/anti joins (no row explosion). Q21's two
correlated EXISTS over the same fact table are the expensive pattern:
both resolve as self-joins on l_orderkey, which AQE can co-locate with
the primary join's exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distgrep_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from distgrep_spark.queries.registry import query
from distgrep_spark.sources.catalog import load_table


@query(
    "tpch_q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery against the fact table,
    decorrelated to a LEFT SEMI join, then a small group-by. (Original
    predicate l_commitdate < l_receiptdate; fixture carries neither, so
    the existence test is l_returnflag = 'R' — same shape, same
    decorrelation.) The semi join never duplicates orders rows no matter
    how many matching lineitems exist — the property that makes EXISTS
    safe at 100 TB where a plain join + distinct would explode."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(returned, o["o_orderkey"] == returned["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year —
    a 6-table snowflake with a DISJUNCTIVE cross-dimension predicate
    that can only be applied after both nation joins. All four dimension
    sides broadcast; the only shuffles are lineitem⋈orders and the final
    3-key aggregate. (Nation names are the fixtures' synthetic
    NATION_1/NATION_2.)"""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(broadcast(n1), c["c_nationkey"] == F.col("c_nkey"))
        .join(broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(broadcast(n2), s["s_nationkey"] == F.col("s_nkey"))
        .where(
            ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
            | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH all_sales AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN part      ON l_partkey = p_partkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           {sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END", "_n").replace(" AS _n", "")}
           / {sql_dsum("volume", "_d").replace(" AS _d", "")} AS mkt_share
    FROM all_sales
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — an 8-table snowflake
    feeding a conditional share-of-total per year. The share is the
    ratio of two exact-decimal sums inside ONE aggregation (the same
    single-pass discipline as Q14). Every dimension broadcasts;
    customer-nation chains to region for the market filter while the
    supplier-nation survives to the CASE — two roles for the same
    nation table via two aliases."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey"))
    n2 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sales = (
        li.join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(broadcast(n1), c["c_nationkey"] == F.col("c_nkey"))
        .join(broadcast(r.where(F.col("r_name") == "EUROPE")), F.col("c_rkey") == r["r_regionkey"])
        .join(broadcast(p.where(F.col("p_type") == "ECONOMY")), li["l_partkey"] == p["p_partkey"])
        .join(broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(broadcast(n2), s["s_nationkey"] == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return sales.groupBy("o_year").agg(
        (
            dsum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0)))
            / dsum("volume")
        ).alias("mkt_share")
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * {sql_dsum(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END",
        "_promo").replace(" AS _promo", "")}
           / {sql_dsum("l_extendedprice * (1 - l_discount)", "_all").replace(" AS _all", "")}
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional share-of-total aggregate — two
    decimal-exact sums in ONE aggregation pass (no double scan, no
    self-join), with the ratio taken between the exact totals.
    (Fixture p_type is a single word, so the PROMO% LIKE becomes
    equality on 'PROMO'.) Part broadcasts; one month of lineitem
    survives the pushed date filter."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / dsum(rev)
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q17_small_quantity",
    oracle=f"""
    WITH qavg AS (
      SELECT l_partkey, {sql_davg("l_quantity", "part_avg_qty")}
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dsum("l_extendedprice", "_t").replace(" AS _t", "")} / 7.0
             AS avg_yearly
    FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN qavg USING (l_partkey)
    WHERE p_brand = 'Brand#23'
      AND l_quantity < 0.2 * part_avg_qty
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-aggregate subquery (each
    lineitem compared to ITS part's average quantity), decorrelated into
    a per-part aggregate joined back to the fact — exactly what Catalyst
    does to the correlated SQL form, written explicitly. The per-part
    average uses the exact-decimal davg so the 0.2× threshold is
    bit-identical on both engines (a knife-edge float avg would flip
    rows). Brand filter prunes the part side before broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    qavg = li.groupBy("l_partkey").agg(davg("l_quantity", "part_avg_qty"))
    return (
        li.join(broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(qavg, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("part_avg_qty"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of conjunctive predicate triples spanning
    BOTH join sides — the optimizer test is that the equi-join key
    (partkey) is still extracted and the cross-side disjunction is
    applied post-join, while the per-side conjuncts (brand/size on part,
    quantity on lineitem) are pushed into each scan as a derived OR
    filter. (Ship-mode/instruction predicates dropped with the missing
    columns; brand/size/quantity keep the disjunctive structure.)"""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(broadcast(p), p["p_partkey"] == li["l_partkey"])
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(clause).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-blame pattern — suppliers whose 'R'
    lines sit in finalized multi-supplier orders where NO other supplier
    has an 'R' line: one EXISTS (semi join) and one NOT EXISTS (anti
    join), both correlated self-joins of the fact table on l_orderkey
    with an inequality on l_suppkey. ('R' returnflag stands in for the
    missing receipt-after-commit lateness columns.) Both existence
    probes shuffle only (orderkey, suppkey) pairs, and the three
    orderkey-hashed exchanges co-locate. Top-k via
    TakeOrderedAndProject; s_name is unique so the ordering is total."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    pairs = li.select("l_orderkey", "l_suppkey")
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l1")
    )
    other = pairs.alias("l2")
    l1 = l1.join(
        other,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    other_r = (
        li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").alias("l3")
    )
    l1 = l1.join(
        other_r,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    return (
        l1.join(o, F.col("l1.l_orderkey") == o["o_orderkey"])
        .where(F.col("o_orderstatus") == "F")
        .join(broadcast(s), F.col("l1.l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "tpch_q22_idle_customers",
    oracle=f"""
    WITH threshold AS (
      SELECT {sql_davg("c_acctbal", "avg_bal")} FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, count(*) AS numcust,
           {sql_dsum("c_acctbal", "totacctbal")}
    FROM customer, threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar-aggregate subquery (the
    above-average-balance threshold) + NOT EXISTS anti join (customers
    with no RECENT orders — every fixture customer has some order, so
    the dormancy window keeps the anti join non-vacuous), grouped per
    nation. The scalar lands as a broadcast 1-row crossJoin — the same
    no-second-pass trick as tfidf's N — and the anti join probes orders
    with only its (o_custkey, o_orderdate) columns. (Fixture customers
    have no phone, so country codes become c_nationkey.) The
    exact-decimal davg keeps the knife-edge > comparison identical on
    both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    threshold = c.where(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal", "avg_bal"))
    recent = o.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        c.crossJoin(broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal"))
    )
