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


# ---------------------------------------------------------------------------
# Round-3 batch: Q2, Q9, Q11, Q12, Q15, Q16, Q20 — completes all 22 TPC-H
# shapes. The fixture has no partsupp table, so the part↔supplier relation
# is DERIVED from lineitem (distinct (l_partkey, l_suppkey) pairs, with
# min(l_extendedprice / l_quantity) as the observed unit supply cost) —
# the structural point of each query (correlated min subquery, global
# scalar threshold, nested semi joins, NOT IN anti join) is preserved
# exactly; the substitution is noted per query.
# ---------------------------------------------------------------------------


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem GROUP BY 1, 2
    ),
    elig AS (
      SELECT ps_partkey, ps_suppkey, supply_cost, s_acctbal, s_name, n_name
      FROM offers
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
    FROM part JOIN elig ON p_partkey = ps_partkey
    WHERE p_size <= 15 AND p_type = 'LARGE'
      AND supply_cost = (SELECT min(supply_cost) FROM elig e2
                         WHERE e2.ps_partkey = p_partkey)
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the EUROPE supplier(s)
    offering the minimum supply cost — a correlated scalar-min subquery,
    decorrelated to a per-part min aggregate joined back on (partkey,
    cost). (No partsupp in the fixture: the offer relation is the
    distinct (l_partkey, l_suppkey) pairs with min unit price as cost.)
    min() is order-independent, so the float equality against the
    per-part minimum is exact on both engines. The 100 TB view: the
    supplier⋈nation⋈region dimension chain broadcasts, and the
    correlated min is a WINDOW min over ps_partkey rather than an
    aggregate re-joined to itself — the window rides the same
    l_partkey hash partitioning as the offers aggregate, so the whole
    decorrelation costs two exchanges and no self sort-merge join
    (the agg+rejoin form measured 5 exchanges + 1 SMJ)."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    offers = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost"))
    eu_supp = (
        s.join(broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(broadcast(r.where(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    elig = (
        offers.join(broadcast(eu_supp), offers["ps_suppkey"] == eu_supp["s_suppkey"])
        .withColumn(
            "_min_cost", F.min("supply_cost").over(Window.partitionBy("ps_partkey"))
        )
        .where(F.col("supply_cost") == F.col("_min_cost"))
    )
    return (
        p.where((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
        .join(elig, p["p_partkey"] == elig["ps_partkey"])
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           {sql_dsum("l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity", "sum_profit")}
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year over a 5-table
    snowflake with a part-name LIKE filter. (No partsupp: unit cost is
    0.5 * p_retailprice instead of ps_supplycost — same expression
    shape, revenue minus cost·quantity.) Per-row arithmetic stays in
    IEEE doubles (bit-identical both engines); only the aggregate goes
    through the exact-decimal dsum. The 100 TB view: part/supplier/
    nation broadcast, the name filter prunes the part build side before
    the join, and the only big shuffle is lineitem⋈orders."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(p.where(F.col("p_name").like("%red%"))), li["l_partkey"] == p["p_partkey"])
        .join(broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount, "sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH stock AS (
      SELECT l_partkey AS ps_partkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS part_value
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_8')
      GROUP BY 1
    )
    SELECT ps_partkey, part_value
    FROM stock
    WHERE part_value > 0.002 * (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
                                FROM lineitem
                                  JOIN supplier ON l_suppkey = s_suppkey
                                  JOIN nation   ON s_nationkey = n_nationkey
                                WHERE n_name IN ('NATION_3', 'NATION_8'))
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value for one nation group,
    kept only where it exceeds a fraction of the GLOBAL total — the
    group-by-HAVING-scalar-subquery pattern. (No partsupp: value =
    sum(l_extendedprice) of the nations' suppliers' shipments.) Both the
    per-part values and the global total go through exact-decimal sums,
    so the 0.002·total threshold compare is bit-identical cross-engine
    (closest fixture ratio is 2.3e-6 away — no knife edge). The 100 TB
    view: the total is a broadcast 1-row crossJoin (no second scan
    barrier on the driver), and both aggregates reuse one partial-agg
    scan shape; nation/supplier broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    nat_supp = (
        s.join(broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .where(F.col("n_name").isin("NATION_3", "NATION_8"))
        .select("s_suppkey")
    )
    shipped = li.join(broadcast(nat_supp), li["l_suppkey"] == F.col("s_suppkey"))
    stock = shipped.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        dsum("l_extendedprice", "part_value")
    )
    total = shipped.agg(dsum("l_extendedprice", "_total"))
    return (
        stock.crossJoin(broadcast(total))
        .where(F.col("part_value") > 0.002 * F.col("_total"))
        .select("ps_partkey", "part_value")
    )


@query(
    "tpch_q12_priority_classes",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact⋈fact join with a pair of CONDITIONAL counts
    (urgent-vs-other order priority) per group. (Fixture has no
    l_shipmode/l_commitdate/l_receiptdate: the group key is
    (l_returnflag, l_linestatus) and the date window is on l_shipdate —
    same join + pivoted conditional aggregation shape.) Conditional
    sums are CAST BIGINT on both sides per the engine-neutral type
    discipline (DuckDB integer sum is HUGEINT). The 100 TB view: the
    date filter pushes to the lineitem scan; partial aggregation
    happens map-side before the 6-group exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-07-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a revenue view per supplier over a date window,
    then the supplier(s) whose revenue EQUALS the view's max — the
    classic aggregate-then-scalar-max-subquery. Revenue goes through
    the exact-decimal dsum so the float equality against max() is exact
    on both engines (max of identical values is order-independent). The
    100 TB view: the max is a broadcast 1-row crossJoin over the
    already-aggregated (tiny) revenue relation — the fact table is
    scanned once; supplier broadcasts into the final join."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        s.join(revenue, s["s_suppkey"] == F.col("supplier_no"))
        .crossJoin(broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("_max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem) ps
      JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#2'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    excluding blacklisted suppliers via NOT IN — which decorrelates to a
    LEFT ANTI join (s_suppkey is non-null, so the NULL trap of NOT IN
    doesn't bite). (No partsupp: the part↔supplier relation is the
    distinct lineitem pairs; 'complaints' proxy is a negative account
    balance.) The 100 TB view: the pair-distinct is the one big
    shuffle; the blacklist and the filtered part dimension both
    broadcast, and count(DISTINCT) over the already-distinct pairs
    needs no second expand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    pairs = li.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    blacklist = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    part_dim = p.where(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    return (
        pairs.join(broadcast(blacklist), pairs["ps_suppkey"] == F.col("s_suppkey"), "left_anti")
        .join(broadcast(part_dim), pairs["ps_partkey"] == part_dim["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_part_promotion",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(CAST(l_quantity AS BIGINT)) > 30)
    """,
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: two-level nested IN — suppliers (in a region)
    who shipped more than a threshold quantity of name-matched parts in
    a year. Both IN levels decorrelate to LEFT SEMI joins; the inner
    one carries a grouped HAVING. (No partsupp/availqty: the 0.5·qty
    correlated threshold becomes a constant 30 against the same
    per-(supplier, part) quantity aggregate — quantities are integral,
    summed as BIGINT, so the HAVING edge is exact.) The 100 TB view:
    the part-name filter broadcasts into a semi join that prunes
    lineitem BEFORE the group-by; the qualifying-supplier set is tiny
    and broadcasts into the final semi join; no row explosion at any
    level."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    red_parts = p.where(F.col("p_name").like("red %")).select("p_partkey")
    qualified = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(broadcast(red_parts), li["l_partkey"] == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("_q"))
        .where(F.col("_q") > 30)
        .select("l_suppkey")
    )
    return (
        s.join(broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(broadcast(r.where(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(broadcast(qualified), s["s_suppkey"] == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
