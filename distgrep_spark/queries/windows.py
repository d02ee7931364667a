"""Window functions (SURVEY.md §2.2 "Window functions").

All orderings inside windows carry a unique tie-break key (o_orderkey /
l_linenumber) so results are deterministic and hash-match the DuckDB
oracle. Double window-sums use the exact-DECIMAL discipline
(functions/numeric.py); per-row arithmetic on identical inputs stays
unrounded. Window partition keys are the same keys upstream shuffles
used — Catalyst reuses the exchange instead of re-shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distgrep_spark.functions.numeric import DEC
from distgrep_spark.queries.registry import query
from distgrep_spark.sources.catalog import load_table


@query(
    "window_rank_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER w AS rn,
             rank()       OVER w AS rnk,
             dense_rank() OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ranking window — the distributed
    answer to per-group top-k (no driver-side loop)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           o_totalprice - coalesce(lag(o_totalprice) OVER w, 0) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead across each customer's order history (sequence deltas)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0))).alias(
            "delta"
        ),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_3
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based windows: running total + 3-row moving average (exact
    decimal accumulation inside the frame, double at the boundary)."""
    o = load_table(spark, sf_dir, "orders")
    ordered = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = ordered.rowsBetween(-2, Window.currentRow)
    dec_price = F.col("o_totalprice").cast(DEC)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec_price).over(running).cast("double").alias("running_total"),
        (
            F.sum(dec_price).over(moving).cast("double") / F.count(F.lit(1)).over(moving)
        ).alias("moving_avg_3"),
    )


@query(
    "window_share_of_group",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice /
             CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) OVER (PARTITION BY l_orderkey)
                  AS DOUBLE) AS price_share,
           count(*) OVER (PARTITION BY l_orderkey) AS lines_in_order
    FROM lineitem
    """,
)
def window_share_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered (whole-partition) window aggregate: each line's share of
    its order — the windowed alternative to a self-join with a groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice")
            / F.sum(F.col("l_extendedprice").cast(DEC)).over(w).cast("double")
        ).alias("price_share"),
        F.count(F.lit(1)).over(w).alias("lines_in_order"),
    )


@query(
    "window_ntile_percent",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank PARTITIONED by market segment: each segment's
    quartiles rank in parallel, so no single-partition window exists in
    the plan and the operator scales with the number of groups. (A truly
    GLOBAL ordered rank needs the bucketed two-pass form —
    ``operators/distrank.py``, round 5 — which ``orders_rfm_segments``
    demonstrates as the scored exact-ntile representative; this entry
    keeps the plain partitioned surface covered post-prefix.)"""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
             OVER (PARTITION BY o_custkey
                   ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
                   RANGE BETWEEN 100000 PRECEDING AND 100000 FOLLOWING)
             AS DOUBLE) AS nearby_price_sum,
           count(*)
             OVER (PARTITION BY o_custkey
                   ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
                   RANGE BETWEEN 100000 PRECEDING AND 100000 FOLLOWING)
             AS nearby_orders
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, vs the ROWS frames elsewhere): peers
    within +-$1000 of each order's price for the same customer. RANGE
    frames are order-value-driven so ties share a frame — semantics ROWS
    cannot express; decimal sum keeps the oracle order-insensitive, and
    the outer CAST(... AS DOUBLE) normalizes the engine-dependent decimal
    sum *width* (Spark DECIMAL(35,6) vs DuckDB DECIMAL(38,6) — round-2
    driver hash mismatch). Cents are exact so the double is lossless.

    The frame key is exact integer CENTS (round(price*100) AS BIGINT,
    bounds 100000), not float dollars: float RANGE boundary arithmetic
    (price ± 1000.0) is engine-dependent at the ulp level, so the same
    peer can fall inside the frame on one engine and outside on the
    other — this query's round-1 driver hash mismatch. Prices are
    2-decimal data, so the cents mapping is lossless."""
    # Integer bounds would now fit Window.rangeBetween, but the SQL frame
    # string keeps the Spark expression textually identical to the oracle.
    frame = (
        "OVER (PARTITION BY o_custkey "
        "ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) "
        "RANGE BETWEEN 100000 PRECEDING AND 100000 FOLLOWING)"
    )
    return load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        f"CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) {frame} AS DOUBLE)"
        " AS nearby_price_sum",
        f"count(*) {frame} AS nearby_orders",
    )


@query(
    "window_forward_fill",
    oracle="""
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS last_click_value
    FROM events
    """,
)
def window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward): every event
    annotated with the most recent click value for its user — the
    gap-fill primitive of sensor/trading pipelines, and the window core
    the as-of join builds on (operators/asof.py). event_id breaks ts
    ties identically on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_val = F.when(F.col("event_type") == "click", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.last(click_val, ignorenulls=True).over(w).alias("last_click_value"),
    )


# ---------------------------------------------------------------------------
# Built-in session_window in BATCH mode, certified against gaps-and-islands
# ---------------------------------------------------------------------------


@query(
    "window_session_builtin",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    o AS (
      SELECT user_id, us,
             CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us)
                       IS NULL
                  OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                       >= 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM e
    ),
    s AS (
      SELECT user_id, us,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS sess
      FROM o
    ),
    per AS (
      SELECT user_id, sess, CAST(count(*) AS BIGINT) AS n_events,
             min(us) AS start_us, max(us) + 1800000000 AS end_us
      FROM s GROUP BY user_id, sess
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS total_events,
           CAST(max(n_events) AS BIGINT) AS max_session_events,
           CAST(sum(end_us - start_us) AS BIGINT) AS total_span_us,
           CAST(min(start_us) AS BIGINT) AS first_start_us
    FROM per GROUP BY user_id
    """,
)
def q_window_session_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window`` aggregation run in BATCH mode,
    certified value-for-value against the manual gaps-and-islands
    construction (the sessionize_events shape) as the DuckDB twin —
    parity evidence that the built-in operator (the one the streaming
    pipelines use) and the classic SQL formulation define the same
    sessions: a session extends to last-event + gap, and a new session
    starts when the inter-event gap reaches the 30-minute threshold
    (end-exclusive; no exact-tie gap exists in the fixtures — parity
    verified across six layout/scale combinations would break on one).

    Exactness: session bounds are compared as tz-free exact epoch
    micros (the ``timestampdiff`` idiom == DuckDB ``epoch_us``,
    CLAUDE.md); per-user rollups are exact BIGINTs.

    The 100-TB shape: ``session_window`` is a first-class aggregation
    key — Catalyst plans one hash partition by user with a sort-based
    session merge, the same single-exchange shape as the manual
    window form, but with the session-merge logic in the operator
    (and at 10^9 users, AQE-splittable like any keyed aggregation).
    This is also exactly what `stream_session_counts` runs under
    micro-batching — the batch run is its oracle-side twin."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.expr("CAST(count(*) AS BIGINT) AS n_events"))
    per = s.selectExpr(
        "user_id",
        "n_events",
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
        " session_window.start) AS start_us",
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
        " session_window.end) AS end_us",
    )
    return per.groupBy("user_id").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_sessions"),
        F.expr("CAST(sum(n_events) AS BIGINT) AS total_events"),
        F.expr("CAST(max(n_events) AS BIGINT) AS max_session_events"),
        F.expr("CAST(sum(end_us - start_us) AS BIGINT) AS total_span_us"),
        F.expr("CAST(min(start_us) AS BIGINT) AS first_start_us"),
    )
