"""Plan-shape assertions (SURVEY.md §3.5, §5.2): the parity between the
reference's hard-coded physical plan and what Catalyst generates for our
declarative queries is documented EXECUTABLE fact here, plus the
scale-critical plan properties (pushdown, pruning, broadcast) that keep
these queries viable at 100 TB.
"""

from __future__ import annotations

import pytest

import distgrep_spark.queries as q
from tests.conftest import SF_ORACLE


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def grep_plan(spark):
    return formatted_plan(q.QUERIES["grep_contains"](spark, SF_ORACLE))


def test_grep_is_partial_final_aggregate(grep_plan):
    """The reference's Map (partial combine, worker.go:31-42) / shuffle
    (server.go:176-191) / Reduce (worker.go:46-62) pipeline must appear
    as HashAggregate(partial) -> Exchange -> HashAggregate(final)."""
    assert "partial_count" in grep_plan
    assert "Exchange" in grep_plan
    assert grep_plan.count("HashAggregate") >= 2


def test_grep_contains_pushed_to_scan(grep_plan):
    """The substring predicate must reach the parquet reader, not run as
    a post-scan filter only."""
    assert "StringContains" in grep_plan


def test_grep_scan_prunes_to_one_column(grep_plan):
    """documents has 5 columns; the grep reads exactly one."""
    assert "ReadSchema: struct<text:string>" in grep_plan


def test_dim_join_broadcasts(spark):
    """lineitem x part must be a broadcast hash join — a shuffle join on
    the fact table at 100 TB is the canonical avoidable exchange."""
    plan = formatted_plan(q.QUERIES["join_broadcast_dim"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_variants(spark):
    """Equality, range, and prefix predicates all push to the scan."""
    plan = formatted_plan(q.QUERIES["filter_predicates"](spark, SF_ORACLE))
    assert "EqualTo(o_orderstatus,O)" in plan
    assert "GreaterThanOrEqual(o_totalprice" in plan
    assert "StringStartsWith(o_orderpriority" in plan


def test_column_pruning_on_projection(spark):
    """A query touching 3 of lineitem's 16 columns must not scan 16."""
    plan = formatted_plan(q.QUERIES["scalar_array_fns"](spark, SF_ORACLE))
    read = next(line for line in plan.splitlines() if "ReadSchema" in line)
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_comment" not in read and "l_shipdate" not in read


def test_topk_plans_take_ordered(spark):
    """orderBy().limit(k) must plan TakeOrderedAndProject, not a global
    sort of the whole input."""
    plan = formatted_plan(q.QUERIES["topk_customers"](spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan


def test_q4_exists_plans_semi_join(spark):
    """The EXISTS subquery must survive as a semi join (no duplication
    of orders rows) with the date range pushed to the orders scan."""
    plan = formatted_plan(q.QUERIES["tpch_q4_priority_exists"](spark, SF_ORACLE))
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q21_plans_semi_and_anti(spark):
    """Q21's EXISTS and NOT EXISTS must both be join forms — one
    LeftSemi, one LeftAnti — not nested per-row subquery execution."""
    plan = formatted_plan(q.QUERIES["tpch_q21_waiting_suppliers"](spark, SF_ORACLE))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan


def test_q19_pushes_derived_disjuncts(spark):
    """The OR-of-conjuncts must still join on the extracted partkey
    equi-key (hash join, not nested loop), with per-side conjuncts
    pushed into each scan."""
    plan = formatted_plan(
        q.QUERIES["tpch_q19_disjunctive_predicates"](spark, SF_ORACLE)
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # each side gets a DERIVED filter from the disjunction, pushed to
    # its parquet scan (the union of the per-branch ranges)
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan  # lineitem scan
    assert "EqualTo(p_brand,Brand#12)" in plan  # part scan


def test_join_range_order_statistic_has_no_join_at_all(spark):
    """The scored join_range is the round-5 order-statistic form
    (operators/rangejoin.py): NO join of any kind remains in the plan —
    count-greater comes from a per-bucket running count over the union
    of both sides plus a constant-folded offset array. In particular no
    nested loop and no pair-producing residual exists to go quadratic
    under densification."""
    from tools.plan_audit import single_partition_windows

    plan = formatted_plan(q.QUERIES["join_range"](spark, SF_ORACLE))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan  # the per-bucket running count
    assert single_partition_windows(plan) == 0


def test_whole_stage_codegen_covers_grep(spark):
    """The grep hot path stays inside generated JVM code (no Python
    boundary): explain(codegen=false) formatted output marks codegen'd
    operators; assert the Filter participates."""
    df = q.QUERIES["grep_filter_only"](spark, SF_ORACLE)
    simple = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "*" in simple  # WholeStageCodegen stages are starred


def test_q2_window_decorrelation_has_no_self_smj(spark):
    """Q2's correlated scalar-min must resolve as a window over the
    offers aggregation's partitioning — not an aggregate re-joined to
    itself (which measured 5 exchanges + a self sort-merge join)."""
    plan = formatted_plan(q.QUERIES["tpch_q2_min_cost_supplier"](spark, SF_ORACLE))
    assert "Window" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q20_nested_in_stays_semi_joins(spark):
    """Both IN levels of Q20 must be semi joins (no row duplication),
    with the part-name filter pushed to the part scan."""
    plan = formatted_plan(q.QUERIES["tpch_q20_part_promotion"](spark, SF_ORACLE))
    assert "LeftSemi" in plan
    assert "StringStartsWith(p_name,red )" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q9_dimensions_broadcast(spark):
    """Q9's part/supplier/nation sides must broadcast; the only
    shuffle-worthy join is lineitem x orders."""
    plan = formatted_plan(q.QUERIES["tpch_q9_product_profit"](spark, SF_ORACLE))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "Contains(p_name,red)" in plan  # LIKE %red% pushed to part scan


def test_sessionize_single_exchange(spark):
    """Both windows and the final group-by key on user_id — the plan
    must contain exactly one hash-partitioning exchange."""
    df = q.QUERIES["sessionize_events"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_quantize_is_map_side_only(spark):
    """int8 quantization must not shuffle: one scan, zero exchanges."""
    df = q.QUERIES["embed_quantize_int8"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_gopher_rules_is_shuffle_free(spark):
    """The whole quality panel must be a projection: zero exchanges."""
    df = q.QUERIES["text_gopher_rules"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_compaction_bins_single_exchange(spark):
    """The source partitioning serves BOTH the prefix-sum window and the
    (source, shard) group-by — exactly one hash exchange."""
    df = q.QUERIES["layout_compaction_bins"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_outliers_broadcast_stats_not_events(spark):
    """Event rows must not shuffle: the only hash exchange is the 5-row
    stats aggregate, which comes back via broadcast."""
    df = q.QUERIES["events_value_outliers"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan


def test_curation_pipeline_no_unbounded_joins(spark):
    """The composed pipeline may only join on keys (sentence, doc_id,
    digest) — no nested-loop joins, no cartesian products."""
    df = q.QUERIES["corpus_curation_pipeline"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, tmp_path):
    """Dynamic partition pruning: when the fact table is hive-partitioned
    on the join key and the dim side carries a selective filter, the
    fact scan must receive a runtime `dynamicpruning` partition filter
    (the broadcast result reused as a scan predicate) — at 100 TB this
    is the difference between scanning one date partition and all of
    them. Static pruning (literal filters) is covered in test_sinks."""
    from pyspark.sql import functions as F

    out = tmp_path / "fact_part"
    fact = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.pmod("id", 10)).alias("pk")
    )
    fact.write.mode("overwrite").partitionBy("pk").parquet(str(out))
    dim = spark.createDataFrame([(3, "three"), (7, "seven")], ["pk", "name"])
    useStats = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try:
        joined = (
            spark.read.parquet(str(out))
            .join(F.broadcast(dim).where(F.col("name") == "three"), "pk")
        )
        assert joined.count() == 100
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", useStats)


def test_aqe_splits_skewed_join_partitions_at_runtime(spark):
    """AQE skew-join: a sort-merge join whose left side piles ~90% of
    rows onto one key must come out of adaptive execution with the hot
    partition SPLIT (`skew=true` on the join, AQEShuffleRead on both
    sides) — the runtime half of the skew story whose planned half is
    operators/skew.py's explicit salting (profile_key_skew decides which
    to reach for). Thresholds are shrunk so test-sized data crosses
    them; the final plan is only observable after an action on the
    joined frame itself."""
    from pyspark.sql import functions as F

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    )
    saved = {k: spark.conf.get(k) for k in keys}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        left = spark.range(0, 60_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 50).alias("k"),
            F.concat(F.lit("x" * 32), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), F.lit("dim").alias("name")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 60_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
        assert plan.count("AQEShuffleRead") >= 1
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _plan_tree(plan: str) -> str:
    """The operator-tree block of a formatted plan (before the
    per-operator detail sections, which repeat every operator name)."""
    return plan.split("\n\n")[0]


def test_cusum_is_one_exchange_one_sort(spark):
    """events_cusum_drift's prefix sum and running min order by the same
    (user_id; ts, event_id) key, so both Window operators must ride ONE
    exchange and ONE sort — the property that keeps the changepoint
    kernel a single-shuffle pass."""
    tree = _plan_tree(
        formatted_plan(q.QUERIES["events_cusum_drift"](spark, SF_ORACLE))
    )
    assert tree.count("Exchange") == 1
    assert tree.count("Sort") == 1


def test_skyline_rollup_equi_join_no_quadratic(spark):
    """part_skyline_pareto replaces the naive O(n^2) dominance anti-join
    with a per-price rollup + distributed running max + ONE equi-join of
    parts back to their price row: no nested-loop/cartesian, one parquet
    scan of part (the rollup side is the localCheckpoint), and no
    single-partition window (round-5 distrank form)."""
    df = q.QUERIES["part_skyline_pareto"](spark, SF_ORACLE)
    tree = _plan_tree(formatted_plan(df))
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert tree.count("Scan parquet") == 1


def test_distrank_queries_have_no_single_partition_windows(spark):
    """Round-5 contract: the seven queries moved off the global-window
    scale-killer class (round-4 verdict 'What's wrong #1') must compile
    to ZERO Window operators fed by an Exchange SinglePartition — every
    rank/cumsum window is hash-partitioned by the distrank bucket."""
    from tools.plan_audit import single_partition_windows

    for name in (
        "orders_rfm_segments",
        "orders_gini_spend",
        "part_skyline_pareto",
        "events_pareto_concentration",
        "pack_token_budget",
        "part_abc_xyz_classification",
        "graph_pagerank_step",
    ):
        df = q.QUERIES[name](spark, SF_ORACLE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert single_partition_windows(plan) == 0, name


def test_single_partition_window_lint_detects_violation(spark):
    """The lint itself must fire when seeded with a violation (a global
    ORDER BY window over an unbounded relation) — and stay quiet on a
    scalar one-row aggregate, which also compiles to an Exchange
    SinglePartition but is not the pathology."""
    from pyspark.sql import functions as F

    from tools.plan_audit import single_partition_windows

    df = spark.range(100).selectExpr(
        "id", "row_number() OVER (ORDER BY id) AS rn"
    )
    assert single_partition_windows(
        df._jdf.queryExecution().executedPlan().toString()
    ) >= 1
    scalar = spark.range(100).agg(F.count(F.lit(1)).alias("n"))
    assert single_partition_windows(
        scalar._jdf.queryExecution().executedPlan().toString()
    ) == 0


def test_pq_assign_broadcasts_codebook(spark):
    """embed_pq_assign's M x k codebook must reach the probe side as a
    broadcast (32 rows), never a shuffled join."""
    plan = formatted_plan(q.QUERIES["embed_pq_assign"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ols_trend_broadcasts_dim_and_single_exchange(spark):
    """The regression kernel must broadcast the part dimension and
    shuffle only the six sufficient statistics (one hash-agg exchange,
    partial+final)."""
    df = q.QUERIES["stats_ols_trend"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_spatial_grid_is_hash_equi_join(spark):
    """The grid cell id must turn the quadratic neighbor search into an
    equi-join (hash or sort-merge), never a nested-loop."""
    plan = formatted_plan(q.QUERIES["join_spatial_grid"](spark, SF_ORACLE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_ks_and_drift_windows_run_on_rollups(spark):
    """The KS cumulative window and drift TV window must sit above an
    aggregate (rollup-then-window), not above the fact scan."""
    for name in ("stats_ks_two_sample", "drift_tv_stability"):
        df = q.QUERIES[name](spark, SF_ORACLE)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        # walking DOWN the tree from the Window node, an aggregate must
        # appear before any scan: the window consumes the bucket rollup,
        # never raw fact rows
        lines = plan.splitlines()
        widx = next(i for i, ln in enumerate(lines) if "Window" in ln)
        below = lines[widx + 1 :]
        sidx = next(i for i, ln in enumerate(below) if "Scan" in ln)
        assert any("HashAggregate" in ln for ln in below[:sidx]), name


def test_bootstrap_hashes_once_per_row(spark):
    """The Poisson CASE ladder must reference one materialized hash
    column, not re-evaluate md5 per branch (measured 3x cost)."""
    plan = formatted_plan(q.QUERIES["sample_poisson_bootstrap"](spark, SF_ORACLE))
    assert plan.count("md5") <= 2, "md5 must appear once (plus possible reuse ref)"


def test_funnel_pattern_single_user_exchange(spark):
    df = q.QUERIES["events_funnel_pattern_regex"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_behavior_pipeline_single_user_exchange(spark):
    """Bot rollup, both sessionization windows, and the session rollup
    all key on user_id: the pipeline must run on ONE user-keyed hash
    exchange plus the 2-row cohort aggregate's exchange."""
    df = q.QUERIES["events_behavior_pipeline"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # user_id-keyed exchanges, the honest floor for a two-pass bot
    # screen: (user_id, minute) burst rollup -> user_id bot rollup on
    # the detector branch, plus ONE user_id exchange that serves both
    # sessionization windows AND the session rollup on the clean
    # branch. Anything >3 means a window or rollup re-shuffled.
    assert plan.count("Exchange hashpartitioning(user_id") == 3


def test_pagerank_constant_plan_per_iteration(spark):
    """Round-6 verdict ask #2: the multi-step kernel's iteration driver
    must not grow — the executed plan of the FINAL step must have the
    same shuffle/scan shape whether 2 or 5 iterations ran before it
    (localCheckpoint cuts the lineage each step), and the per-node
    deltas must actually SHRINK across iterations (a convergence
    certificate, not just a loop that runs)."""
    from pyspark.sql import functions as F

    from distgrep_spark.queries.profiling import _pagerank_iters

    sf = SF_ORACLE.replace("sf0.01", "sf0.001")

    def shape(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return (
            plan.count("Exchange hashpartitioning"),
            plan.count("Scan parquet"),
            plan.count("Window ["),
        )

    pr2, prev2 = _pagerank_iters(spark, sf, 2)
    pr5, prev5 = _pagerank_iters(spark, sf, 5)
    assert shape(pr2) == shape(pr5), "lineage grew with iteration count"

    def l1_delta(pr, prev):
        return (
            pr.withColumnRenamed("pr", "a")
            .join(prev.withColumnRenamed("pr", "b"), "part")
            .agg(F.expr("sum(abs(a - b))"))
            .collect()[0][0]
        )

    d2, d5 = l1_delta(pr2, prev2), l1_delta(pr5, prev5)
    assert d2 > 0, "vacuous: no movement by iteration 2"
    # 0.85 damping contracts the iteration map; 3 more steps must cut
    # the L1 delta well below one step's worth of slack
    assert d5 < d2 * 0.85, f"deltas not contracting: {d2} -> {d5}"


def test_bnlj_lint_catches_seeded_violations(spark):
    """Seeded-violation proof for tools/plan_audit.unbounded_bnlj
    (round-6 verdict ask #3): RED on a theta join that broadcasts a
    table-scale side, GREEN on the two sound auto-proven shapes (a
    scalar-aggregate broadcast; a literal Range spine) so the allowlist
    only ever carries genuinely unprovable cases."""
    from pyspark.sql import functions as F

    from tools.plan_audit import unbounded_bnlj

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # RED: theta join broadcasting the full customer table — the plan
    # alone cannot bound the build side
    bad = orders.join(
        F.broadcast(customer), orders.o_totalprice > customer.c_acctbal
    )
    assert unbounded_bnlj(plan(bad)) >= 1

    # GREEN: scalar-aggregate broadcast (keys=[] -> exactly one row)
    total = orders.agg(F.sum("o_totalprice").alias("tot"))
    ok_scalar = orders.join(F.broadcast(total), orders.o_totalprice > total.tot)
    assert unbounded_bnlj(plan(ok_scalar)) == 0

    # GREEN: literal Range spine broadcast (bounded by construction)
    spine = spark.range(4).withColumnRenamed("id", "k")
    ok_range = orders.join(F.broadcast(spine), orders.o_orderkey % 7 > spine.k)
    assert unbounded_bnlj(plan(ok_range)) == 0


def test_sp_window_lint_catches_seeded_violations(spark):
    """Seeded-violation proof that tools/plan_audit's single-partition
    window detector fails RED on both hazard shapes (round-5 verdict:
    the old Exchange-pattern heuristic silently missed windows whose
    input lineage was already single-partition), and stays green on the
    partitioned shapes — including the partitioned-UNORDERED window
    (``sum() OVER (PARTITION BY k)``) whose plan line also prints only
    two bracket groups and false-positived a count-based draft."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from tools.plan_audit import single_partition_windows

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # shape 1: empty partition spec — Catalyst needs no Exchange when
    # the lineage is already single-partition, but WindowExec still
    # serializes on one task; the lint must count it
    bad_global = orders.coalesce(1).selectExpr(
        "o_orderkey",
        "row_number() OVER (ORDER BY o_totalprice DESC) AS rn",
    )
    assert single_partition_windows(plan(bad_global)) >= 1

    # shape 2: constant partition key — non-empty spec, so shape 1
    # misses it; the Exchange SinglePartition beneath the Window is
    # the tell
    bad_const = orders.select(
        "o_orderkey",
        F.sum("o_totalprice")
        .over(Window.partitionBy(F.lit(1)).orderBy("o_orderkey"))
        .alias("cum"),
    )
    assert single_partition_windows(plan(bad_const)) >= 1

    # green: partitioned-and-ordered
    ok_ranked = orders.select(
        "o_orderkey",
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderkey"))
        .alias("rn"),
    )
    assert single_partition_windows(plan(ok_ranked)) == 0

    # green: partitioned-unordered (two bracket groups, no sort tokens)
    ok_total = orders.select(
        "o_orderkey",
        F.sum("o_totalprice").over(Window.partitionBy("o_custkey")).alias("tot"),
    )
    assert single_partition_windows(plan(ok_total)) == 0


def test_bradley_terry_constant_plan_per_iteration(spark):
    """Second iterative kernel certified to convergence (round-7): the
    BT MM loop's step plan must be shape-constant in k (localCheckpoint
    cuts the lineage) and the strength deltas must contract."""
    from pyspark.sql import functions as F

    from distgrep_spark.queries.integration import _bt_iters

    sf = SF_ORACLE.replace("sf0.01", "sf0.001")

    def shape(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return (
            plan.count("Exchange hashpartitioning"),
            plan.count("Scan parquet"),
            plan.count("BroadcastHashJoin"),
        )

    _, _, p2, u2 = _bt_iters(spark, sf, 2)
    _, _, p5, u5 = _bt_iters(spark, sf, 5)
    assert shape(u2) == shape(u5), "lineage grew with iteration count"

    def l1_delta(u, prev):
        return (
            u.selectExpr("b", "u AS a")
            .join(prev.selectExpr("b", "u AS bb"), "b")
            .agg(F.expr("sum(abs(a - bb))"))
            .collect()[0][0]
        )

    d2, d5 = l1_delta(u2, p2), l1_delta(u5, p5)
    assert d2 > 0, "vacuous: no movement by iteration 2"
    assert d5 < d2 * 0.85, f"deltas not contracting: {d2} -> {d5}"
