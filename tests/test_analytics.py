"""Property tests for the round-3 batch-5 analytics queries (DuckDB value
parity itself is covered by tools/check_oracles.py)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import distgrep_spark.queries as q
from distgrep_spark.sources.catalog import load_table


def test_bitmap_distinct_equals_exact_everywhere(spark, sf_dir):
    rows = q.QUERIES["agg_bitmap_distinct"](spark, sf_dir).collect()
    assert rows, "orders fixture has at least one month"
    for r in rows:
        assert r["bitmap_matches_exact"] is True
        assert r["n_distinct_bitmap"] == r["n_distinct_exact"] > 0


def test_bitmap_words_idempotent_under_duplication(spark, sf_dir):
    # bit_or is idempotent: doubling the input must not change the counts.
    o = load_table(spark, sf_dir, "orders")
    base = q.QUERIES["agg_bitmap_distinct"](spark, sf_dir)
    doubled = (
        o.unionAll(o)
        .selectExpr(
            "date_trunc('month', o_orderdate) AS month",
            "o_custkey DIV 32 AS word",
            "shiftleft(CAST(1 AS BIGINT), CAST(o_custkey % 32 AS INT)) AS mask",
        )
        .groupBy("month", "word")
        .agg(F.expr("bit_or(mask)").alias("w"))
        .groupBy("month")
        .agg(F.expr("CAST(sum(bit_count(w)) AS BIGINT)").alias("n2"))
    )
    joined = base.join(doubled, "month").collect()
    assert len(joined) == base.count()
    for r in joined:
        assert r["n2"] == r["n_distinct_bitmap"]


def test_fuzzy_blocked_recall_is_total(spark, sf_dir):
    """Every corrupted probe must re-link to its own source row at
    distance exactly 1 (single substitution), and no reported pair may
    exceed the verify threshold."""
    rows = q.QUERIES["join_fuzzy_blocked"](spark, sf_dir).collect()
    p = load_table(spark, sf_dir, "part")
    probes = {r["p_partkey"] for r in p.where("p_partkey % 37 = 0").collect()}
    self_hits = {
        r["probe_key"]: r["lev_dist"]
        for r in rows
        if r["probe_key"] == r["matched_key"]
    }
    assert set(self_hits) == probes
    assert all(d == 1 for d in self_hits.values())
    assert all(0 <= r["lev_dist"] <= 2 for r in rows)


def test_pq_assign_centroids_code_themselves(spark, sf_dir):
    rows = {r["vec_id"]: r for r in q.QUERIES["embed_pq_assign"](spark, sf_dir).collect()}
    emb_n = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == emb_n
    for cid in range(8):
        r = rows[cid]
        # A codebook vector's nearest centroid in every subspace is itself.
        assert [r[f"code_{m}"] for m in range(4)] == [cid] * 4
        assert r["total_dist"] == 0
    for r in rows.values():
        assert all(0 <= r[f"code_{m}"] <= 7 for m in range(4))
        assert r["total_dist"] >= 0


def test_rfm_segments_partition_customers(spark, sf_dir):
    rows = q.QUERIES["orders_rfm_segments"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    pat = re.compile(r"^R[1-5]F[1-5]M[1-5]$")
    assert all(pat.match(r["segment"]) for r in rows)
    total = sum(r["sum_monetary"] for r in rows)
    exact = o.agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)"))).collect()[0][0]
    assert abs(total - float(exact)) < 1e-6 * float(exact)


def test_shingle_containment_bounds_and_asymmetry(spark, sf_dir):
    rows = q.QUERIES["text_shingle_containment"](spark, sf_dir).collect()
    assert rows, "documents fixture plants near-duplicates at every SF"
    for r in rows:
        assert 0.8 <= r["containment"] <= 1.0
        assert r["n_common"] >= 1
    # Containment is directional: the pair set is NOT symmetric in
    # general, but any symmetric pair implies both docs share >=80% of
    # their shingles with each other (near-dup in the Jaccard sense too).
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert all(a != b for a, b in pairs)


def test_reservoir_sample_is_exact_k_and_stable(spark, sf_dir):
    rows1 = q.QUERIES["sample_reservoir_per_key"](spark, sf_dir).collect()
    rows2 = q.QUERIES["sample_reservoir_per_key"](spark, sf_dir).collect()
    by_key: dict[str, set] = {}
    for r in rows1:
        assert 1 <= r["rn"] <= 3
        by_key.setdefault(r["priority"], set()).add(r["o_orderkey"])
    assert all(len(v) == 3 for v in by_key.values())
    # Rank-by-hash is stateless: re-running draws the identical sample.
    assert {(r["priority"], r["o_orderkey"], r["rn"]) for r in rows1} == {
        (r["priority"], r["o_orderkey"], r["rn"]) for r in rows2
    }


def test_ewma_first_event_is_identity_and_bounded(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = {
        (r["user_id"], r["event_id"]): r["value"]
        for r in ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .collect()
    }
    bounds = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    rows = q.QUERIES["events_ewma_smooth"](spark, sf_dir).collect()
    assert len(rows) == ev.count()
    for r in rows:
        key = (r["user_id"], r["event_id"])
        if key in first:
            assert r["ewma"] == first[key]  # no history -> identity
        lo, hi = bounds[r["user_id"]]
        assert lo - 1e-9 <= r["ewma"] <= hi + 1e-9  # convex combination


def test_rfm_quartiles_partition_customers(spark, sf_dir):
    rows = q.QUERIES["orders_rfm_quartiles"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    assert sum(r["n_customers"] for r in rows) == o.select(
        "o_custkey"
    ).distinct().count()
    pat = re.compile(r"^R[1-4]F[1-4]M[1-4]$")
    assert all(pat.match(r["segment"]) for r in rows)


def test_link_prediction_excludes_edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = {
        (r["u"], r["v"])
        for r in a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .count()
        .where("count >= 2")
        .collect()
    }
    rows = q.QUERIES["graph_link_prediction"](spark, sf_dir).collect()
    for r in rows:
        pair = (r["part_a"], r["part_b"])
        assert r["part_a"] < r["part_b"]
        assert pair not in edges  # predicted links are NON-edges
        assert r["common_neighbors"] >= 2
        # both endpoints have >= 2 neighbors (they share >= 2), so
        # preferential attachment is at least 4
        assert r["pref_attach"] >= 4


def test_cusum_closed_form_matches_recursion(spark, sf_dir):
    """The prefix-minus-running-min closed form must equal the textbook
    recursion S_i = max(0, S_{i-1} + d_i), replayed in Python per user."""
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "event_id", "ts",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) - 5000 AS d",
    ).collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    want = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        s = 0
        for r in rows:
            s = max(0, s + r["d"])
            want[(uid, r["event_id"])] = s
    got = q.QUERIES["events_cusum_drift"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        w = want[(r["user_id"], r["event_id"])]
        assert r["cusum_cents"] == w
        assert r["flagged"] == (w > 15000)


def test_winnowing_density_and_coverage(spark, sf_dir):
    rows = q.QUERIES["text_winnowing_select"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        n_windows = r["n_grams"] - 3
        assert 1 <= r["n_selected"] <= n_windows
        assert 0.0 < r["density"] <= 1.0
    # Expected density for w=4 is 2/(w+1) = 0.4; the corpus mean should
    # sit near it (hash positions are effectively uniform).
    mean = sum(r["density"] for r in rows) / len(rows)
    assert 0.25 < mean < 0.55, mean


def test_patch_grid_matches_arithmetic(spark, sf_dir):
    rows = q.QUERIES["multimodal_patch_grid"](spark, sf_dir).collect()
    docs_n = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == docs_n
    for r in rows:
        w = r["doc_id"] % 640 + 64
        h = r["doc_id"] % 480 + 48
        nx, ny = -(-w // 64), -(-h // 64)
        assert r["n_patches"] == nx * ny
        edge = nx * ny - (w // 64) * (h // 64)
        assert r["n_edge_patches"] == edge
        assert r["covers_exactly"] is True


def test_cohort_ltv_totals_and_monotone(spark, sf_dir):
    rows = q.QUERIES["orders_cohort_ltv"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    total = sum(r["revenue"] for r in rows)
    exact = o.agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)"))).collect()[0][0]
    assert abs(total - float(exact)) < 1e-6 * float(exact)
    by_cohort: dict = {}
    for r in rows:
        assert r["k"] >= 0
        by_cohort.setdefault(r["cohort"], []).append(r)
    for cells in by_cohort.values():
        cells.sort(key=lambda r: r["k"])
        assert cells[0]["k"] == 0  # every cohort starts at its birth month
        cum = [c["cum_revenue"] for c in cells]
        assert cum == sorted(cum)  # LTV curve is non-decreasing


def test_skyline_matches_naive_dominance(spark, sf_dir):
    pts = [
        (r["p_partkey"], round(r["p_retailprice"] * 100), r["p_size"])
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in pts
        )
    want = {p[0] for p in pts if not dominated(p)}
    got = {
        r["p_partkey"]
        for r in q.QUERIES["part_skyline_pareto"](spark, sf_dir).collect()
    }
    assert got == want and got


def test_max_drawdown_matches_python_scan(spark, sf_dir):
    rows = {
        r["c_mktsegment"]: r
        for r in q.QUERIES["window_max_drawdown"](spark, sf_dir).collect()
    }
    daily = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
            F.expr("o_custkey = c_custkey"),
        )
        .selectExpr(
            "c_mktsegment AS seg",
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS d",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .groupBy("seg", "d")
        .agg(F.expr("CAST(sum(cents) AS BIGINT) AS rev"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r["seg"], []).append((r["d"], r["rev"]))
    assert set(series) == set(rows)
    for seg, pts in series.items():
        peak, best = 0, (-1, None)  # (drawdown, earliest day)
        for d, rev in sorted(pts):
            peak = max(peak, rev)
            dd = peak - rev
            if dd > best[0]:
                best = (dd, d)
        assert rows[seg]["max_drawdown_cents"] == best[0]
        assert rows[seg]["drawdown_day"] == best[1]


def test_bot_panel_variance_and_flags(spark, sf_dir):
    rows = q.QUERIES["events_bot_score_panel"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["max_per_minute"] >= 1
        assert r["n_gaps"] >= 1
        assert r["gap_var_sec2"] >= 0.0
        assert r["burst_flag"] == (r["max_per_minute"] >= 2)
        assert r["metronome_flag"] == (r["gap_var_sec2"] < 5e8)
    assert any(r["burst_flag"] for r in rows) or all(
        r["max_per_minute"] == 1 for r in rows
    )


def test_weighted_median_splits_weight(spark, sf_dir):
    rows = q.QUERIES["agg_weighted_median"](spark, sf_dir).collect()
    assert len(rows) > 0
    w = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "part").select(
                "p_partkey", "p_brand", "p_retailprice"
            ),
            F.expr("l_partkey = p_partkey"),
        )
        .selectExpr(
            "p_brand",
            "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) DIV 10 AS v",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q",
        )
        .collect()
    )
    from collections import defaultdict

    per_brand = defaultdict(lambda: defaultdict(int))
    for r in w:
        per_brand[r["p_brand"]][r["v"]] += r["q"]
    for r in rows:
        vals = per_brand[r["p_brand"]]
        total = sum(vals.values())
        assert r["total_weight"] == total
        m = r["weighted_median_dimes"]
        below = sum(q_ for v, q_ in vals.items() if v < m)
        at_or_below = sum(q_ for v, q_ in vals.items() if v <= m)
        # lower weighted median: at least half the weight at or below,
        # strictly less than half strictly below
        assert 2 * at_or_below >= total
        assert 2 * below < total


def test_jl_projection_preserves_distances_on_average(spark, sf_dir):
    """JL with k=16: ratios concentrate near 1; the mean over 190
    pairs must be well inside [0.5, 1.5] and every ratio positive."""
    rows = q.QUERIES["embed_jl_projection_audit"](spark, sf_dir).collect()
    assert len(rows) == 190
    ratios = [r["jl_ratio"] for r in rows]
    assert all(r > 0 for r in ratios)
    mean = sum(ratios) / len(ratios)
    assert 0.5 < mean < 1.5, f"sign matrix degenerate: mean ratio {mean}"
    for r in rows:
        assert r["proj_d2"] >= 0 and r["orig_d2"] > 0
        assert r["jl_ratio"] == r["proj_d2"] / (16.0 * r["orig_d2"])


def test_lateral_topn_is_decorrelated_and_correct(spark, sf_dir):
    """The LATERAL subquery must decorrelate (no per-row loop — a
    single plan with a window or ranked join) and return each panel
    customer's true top-2 orders."""
    df = q.QUERIES["join_lateral_topn"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = df.collect()
    orders = (
        load_table(spark, sf_dir, "orders")
        .where("o_custkey < 50")
        .selectExpr(
            "o_custkey",
            "o_orderkey",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    )
    per = {}
    for o in orders:
        per.setdefault(o["o_custkey"], []).append((-o["cents"], o["o_orderkey"]))
    for ck, lst in per.items():
        expect = sorted(lst)[:2]
        got = sorted(
            (-r["cents"], r["o_orderkey"]) for r in rows if r["c_custkey"] == ck
        )
        assert got == expect, ck
    assert all(r["rnk"] in (1, 2) for r in rows)


def test_price_volume_effects_bridge_to_delta(spark, sf_dir):
    rows = q.QUERIES["orders_price_volume_decomposition"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["delta_cents"] == r["r1"] - r["r0"]
        # the two effects bridge the revenue change up to IEEE rounding
        assert abs((r["volume_effect"] + r["price_effect"]) - r["delta_cents"]) < 1e-3


def test_bag_semantics_multiplicities(spark, sf_dir):
    """INTERSECT ALL keeps min(m_a, m_b) copies; EXCEPT ALL keeps
    max(m_a - m_b, 0) — verified against direct multiset counts."""
    from collections import Counter

    rows = q.QUERIES["set_ops_bag_semantics"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    a = Counter(
        r["k"] for r in li.where("l_returnflag = 'R'").selectExpr("l_partkey AS k").collect()
    )
    b = Counter(
        r["k"] for r in li.where("l_linestatus = 'F'").selectExpr("l_partkey AS k").collect()
    )
    got_i = {r["k"]: r["multiplicity"] for r in rows if r["op"] == "intersect_all"}
    got_e = {r["k"]: r["multiplicity"] for r in rows if r["op"] == "except_all"}
    want_i = {k: min(a[k], b[k]) for k in a if k in b and min(a[k], b[k]) > 0}
    want_e = {k: a[k] - b.get(k, 0) for k in a if a[k] - b.get(k, 0) > 0}
    assert got_i == want_i
    assert got_e == want_e


def test_abc_xyz_class_boundaries(spark, sf_dir):
    rows = q.QUERIES["part_abc_xyz_classification"](spark, sf_dir).collect()
    assert rows
    by_class = {}
    total = sum(r["revenue_cents"] for r in rows)
    for r in rows:
        by_class.setdefault(r["abc_class"], []).append(r["revenue_cents"])
        assert r["xyz_class"] in ("X", "Y", "Z")
    assert set(by_class) <= {"A", "B", "C"} and "A" in by_class
    # A-class revenue share is ~80% (within one part's revenue of it)
    a_share = sum(by_class["A"]) / total
    assert a_share <= 0.80 + max(by_class["A"]) / total
    # every A part out-earns every C part
    if "C" in by_class:
        assert min(by_class["A"]) >= max(by_class["C"])


def test_behavior_pipeline_conservation(spark, sf_dir):
    rows = {r["cohort"]: r for r in q.QUERIES["events_behavior_pipeline"](spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    ev = load_table(spark, sf_dir, "events")
    n_events_total = ev.count()
    kept = sum(r["n_events"] for r in rows.values())
    assert kept <= n_events_total
    for r in rows.values():
        assert r["n_sessions"] >= r["n_users"] >= 1
        assert 0.0 <= r["purchase_session_share"] <= 1.0
        assert r["funnel_sessions"] <= r["n_sessions"]
        assert r["mean_session_events"] == r["n_events"] / r["n_sessions"]


def test_token_budget_sums_exactly(spark, sf_dir):
    rows = q.QUERIES["corpus_token_budget_allocation"](spark, sf_dir).collect()
    assert rows
    assert sum(r["alloc_tokens"] for r in rows) == 1_000_000
    total = sum(r["tokens"] for r in rows)
    for r in rows:
        # allocation within 1 of the exact proportional share
        exact = r["tokens"] * 1_000_000 / total
        assert abs(r["alloc_tokens"] - exact) < 1.0
        assert r["alloc_tokens"] in (r["floor_alloc"], r["floor_alloc"] + 1)


def test_modularity_terms_sum_in_range(spark, sf_dir):
    rows = q.QUERIES["graph_modularity_by_brand"](spark, sf_dir).collect()
    assert rows
    m = rows[0]["n_edges"]
    assert all(r["n_edges"] == m for r in rows)
    assert sum(r["degree_sum"] for r in rows) == 2 * m, "handshake lemma"
    assert sum(r["intra_edges"] for r in rows) <= m
    q_mod = sum(r["modularity_term"] for r in rows)
    assert -1.0 <= q_mod <= 1.0


def test_assortativity_in_range_and_symmetric(spark, sf_dir):
    (r,) = q.QUERIES["graph_assortativity_degree"](spark, sf_dir).collect()
    assert r["n_edge_ends"] % 2 == 0, "symmetrized edge ends come in pairs"
    assert -1.0 <= r["assortativity"] <= 1.0


def test_batch_padding_plan_accounting(spark, sf_dir):
    rows = q.QUERIES["text_batch_padding_plan"](spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["padding_tokens"] >= 0
        assert 0.0 <= r["padding_waste_share"] < 1.0
        assert r["n_batches"] >= (r["n_docs"] + 7) // 8
        assert r["padding_tokens"] == pytest.approx(
            r["padding_waste_share"] * (r["real_tokens"] + r["padding_tokens"])
        )


def test_order_reconciliation_covers_all_orders(spark, sf_dir):
    rows = {r["recon_class"]: r for r in q.QUERIES["dq_order_total_reconciliation"](spark, sf_dir).collect()}
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in rows.values()) == n_orders
    for r in rows.values():
        assert r["worst_gap_cents"] <= r["total_abs_gap_cents"]
    if "exact" in rows:
        assert rows["exact"]["total_abs_gap_cents"] == 0


def test_gini_matches_dense_python(spark, sf_dir):
    (r,) = q.QUERIES["orders_gini_spend"](spark, sf_dir).collect()
    spend = sorted(
        x["cents"]
        for x in load_table(spark, sf_dir, "orders")
        .selectExpr("o_custkey", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
        .groupBy("o_custkey")
        .agg(F.expr("CAST(sum(cents) AS BIGINT) AS cents"))
        .collect()
    )
    n, total = len(spend), sum(spend)
    gini = 2.0 * sum((i + 1) * x for i, x in enumerate(spend)) / (n * total) - (n + 1.0) / n
    assert abs(r["gini"] - gini) < 1e-12
    assert 0.0 <= r["gini"] < 1.0


def test_churn_labels_are_leak_free(spark, sf_dir):
    rows = q.QUERIES["orders_churn_labels"](spark, sf_dir).collect()
    assert rows
    orders = (
        load_table(spark, sf_dir, "orders")
        .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS d")
        .collect()
    )
    from collections import defaultdict

    pre, post = defaultdict(int), set()
    import datetime

    cutoff = datetime.date(2000, 1, 1)
    end = datetime.date(2001, 1, 1)
    for o in orders:
        if o["d"] < cutoff:
            pre[o["o_custkey"]] += 1
        elif o["d"] < end:
            post.add(o["o_custkey"])
    got = {r["o_custkey"]: r for r in rows}
    assert set(got) == set(pre), "exactly the pre-cutoff customers get rows"
    for ck, r in got.items():
        assert r["frequency"] == pre[ck]
        assert r["churned"] == (ck not in post)
        assert r["recency_days"] > 0


def test_feature_norm_stats_match_numpy(spark, sf_dir):
    import numpy as np

    rows = {r["dim"]: r for r in q.QUERIES["embed_feature_norm_stats"](spark, sf_dir).collect()}
    vecs = np.array(
        [r["embedding"] for r in load_table(spark, sf_dir, "embeddings").collect()],
        dtype=np.float64,
    )
    assert set(rows) == set(range(vecs.shape[1]))
    for d in range(vecs.shape[1]):
        col = vecs[:, d]
        r = rows[d]
        assert r["n"] == len(col)
        assert abs(r["mean_val"] - col.mean()) < 1e-9
        assert abs(r["var_val"] - col.var()) < 1e-9
        assert r["min_val"] == col.min() and r["max_val"] == col.max()


def test_aspect_buckets_cover_all_images(spark, sf_dir):
    rows = q.QUERIES["multimodal_aspect_buckets"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_images"] for r in rows) == n_docs
    ladder = {"square_1_1", "land_4_3", "port_3_4", "land_16_9", "port_9_16"}
    assert {r["bucket"] for r in rows} <= ladder
    for r in rows:
        assert r["min_aspect_milli"] <= r["max_aspect_milli"]


def test_hhi_bounds_and_identity(spark, sf_dir):
    rows = q.QUERIES["supplier_concentration_hhi"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        lo = 1.0 / r["n_suppliers"]
        assert lo - 1e-12 <= r["hhi"] <= 1.0
        assert r["top_share"] ** 2 <= r["hhi"] + 1e-12
        assert r["top_share"] <= 1.0


def test_mahalanobis_mean_is_dimensionality(spark, sf_dir):
    rows = q.QUERIES["embed_mahalanobis_screen"](spark, sf_dir).collect()
    n_dims = 64
    assert rows
    scores = [r["mahalanobis_sq"] for r in rows]
    assert all(s > 0 for s in scores)
    # population-variance standardization: mean d2 == n_dims exactly
    # (up to float fold error)
    mean = sum(scores) / len(scores)
    assert abs(mean - n_dims) < 0.01


def test_kmeans_pp_seed_is_true_farthest_point(spark, sf_dir):
    (r,) = q.QUERIES["kmeans_pp_seed_step"](spark, sf_dir).collect()
    vecs = {
        row["vec_id"]: [
            max(-127, min(127, int(__import__("math").floor(float(v) * 200 + 0.5))))
            for v in row["embedding"]
        ]
        for row in load_table(spark, sf_dir, "embeddings").collect()
    }
    seeds = [vecs[0], vecs[1]]
    best = None
    for vid, qv in vecs.items():
        if vid < 2:
            continue
        d = min(sum((a - b) ** 2 for a, b in zip(qv, s)) for s in seeds)
        key = (-d, vid)
        if best is None or key < best[0]:
            best = (key, vid, d)
    assert (r["next_seed"], r["min_d2"]) == (best[1], best[2])


def test_duplicate_payment_pairs_verified(spark, sf_dir):
    rows = q.QUERIES["dq_duplicate_payment_screen"](spark, sf_dir).collect()
    orders = {
        r["o_orderkey"]: r
        for r in load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderkey",
            "o_custkey",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 10000 AS amt",
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS d",
        )
        .collect()
    }
    for r in rows:
        a, b = orders[r["first_orderkey"]], orders[r["second_orderkey"]]
        assert a["o_custkey"] == b["o_custkey"] == r["o_custkey"]
        assert a["amt"] == b["amt"] == r["amount_hundreds"]
        assert 0 <= r["gap_days"] <= 90
        assert b["d"] - a["d"] == r["gap_days"]


def test_diff_in_diff_matches_python(spark, sf_dir):
    (r,) = q.QUERIES["stats_diff_in_diff"](spark, sf_dir).collect()
    for c in ("t0", "t1", "c0", "c1", "nt0", "nt1", "nc0", "nc1"):
        assert r[c] > 0
    did = (r["t1"] / r["nt1"] - r["t0"] / r["nt0"]) - (
        r["c1"] / r["nc1"] - r["c0"] / r["nc0"]
    )
    assert r["did_estimate"] == did
    assert abs(did) < 1.0


def test_argminmax_match_direct_sort(spark, sf_dir):
    rows = {r["o_orderpriority"]: r for r in q.QUERIES["agg_argminmax_fns"](spark, sf_dir).collect()}
    o = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderpriority",
            "o_orderkey",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    )
    from collections import defaultdict

    per = defaultdict(list)
    for r in o:
        per[r["o_orderpriority"]].append((r["cents"], r["o_orderkey"]))
    assert set(per) == set(rows)
    for pri, lst in per.items():
        top = max(lst)
        bot = min(lst)
        r = rows[pri]
        assert (r["top_cents"], r["top_order"]) == top
        assert (r["bottom_cents"], r["bottom_order"]) == bot


def test_standardized_rate_is_convex_mix(spark, sf_dir):
    rows = q.QUERIES["stats_standardized_rate"](spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        assert 0.0 <= r["crude_rate"] <= 1.0
        assert 0.0 <= r["standardized_rate"] <= 1.0
        # standardization re-weights within the same stratum rates, so it
        # stays within the min/max stratum rate band — loose sanity:
        assert abs(r["standardized_rate"] - r["crude_rate"]) < 0.2


def test_trimmed_mean_matches_python_reference(spark, tmp_path):
    """agg_trimmed_mean's window-rank trim against a sorted-slice Python
    reference, including the n < 10 group where k = n DIV 10 = 0 and the
    trimmed mean must equal the plain mean."""
    import distgrep_spark.queries as q

    rows = []
    # group A: 23 values incl. outliers; group B: 7 values (k = 0)
    a_vals = [100, 101, 99, 250000, 102, 98, 97, 103, 100, 101,
              99, 100, 102, 98, 1, 100, 101, 99, 100, 102, 98, 100, 101]
    b_vals = [10, 20, 30, 40, 50, 60, 70]
    for i, v in enumerate(a_vals):
        rows.append((i, "A", float(v)))
    for i, v in enumerate(b_vals):
        rows.append((100 + i, "B", float(v)))
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderpriority string,"
        " o_totalprice double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    def ref(vals):
        cents = sorted(int(v * 100 + 0.5) for v in vals)
        k = len(cents) // 10
        kept = cents[k: len(cents) - k] if k else cents
        return sum(kept) / len(kept)

    out = {
        r["priority"]: (r["k_trimmed_each_side"], r["trimmed_mean_cents"])
        for r in q.QUERIES["agg_trimmed_mean"](spark, str(tmp_path)).collect()
    }
    assert out["A"][0] == 2 and abs(out["A"][1] - ref(a_vals)) < 1e-9
    assert out["B"][0] == 0 and abs(out["B"][1] - ref(b_vals)) < 1e-9
