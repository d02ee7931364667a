"""Property tests for the round-3 profiling/layout query batch (the
DuckDB value parity itself is covered by tools/check_oracles.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

import distgrep_spark.queries as q
from distgrep_spark.operators.text import dup_span_fraction
from distgrep_spark.sources.catalog import load_table


def test_profile_matches_single_column_facts(spark, sf_dir):
    rows = {r["column_name"]: r for r in q.QUERIES["profile_column_stats"](spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    assert set(rows) == {"o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate"}
    for r in rows.values():
        assert r["n_rows"] == n
        assert r["n_nulls"] == 0
    assert rows["o_custkey"]["n_distinct"] == o.select("o_custkey").distinct().count()


def test_histogram_partitions_the_table(spark, sf_dir):
    hist = q.QUERIES["agg_histogram_equiwidth"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    assert sum(r["n_orders"] for r in hist) == o.count()
    for r in hist:
        assert 0 <= r["bin_id"] <= 19
        assert r["bin_lo"] == r["bin_id"] * 25000.0
    total = sum(r["price_sum"] for r in hist)
    exact = o.agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)"))).collect()[0][0]
    assert abs(total - float(exact)) < 1e-6 * max(1.0, float(exact))


def test_topk_per_group_is_bounded_and_ranked(spark, sf_dir):
    rows = q.QUERIES["window_topk_per_group"](spark, sf_dir).collect()
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(r)
    for seg_rows in by_seg.values():
        assert 1 <= len(seg_rows) <= 3
        seg_rows.sort(key=lambda r: r["rn"])
        assert [r["rn"] for r in seg_rows] == list(range(1, len(seg_rows) + 1))
        prices = [r["o_totalprice"] for r in seg_rows]
        assert prices == sorted(prices, reverse=True)


def test_bloom_prefilter_no_false_negatives_and_bounded_fp(spark, sf_dir):
    rows = q.QUERIES["join_bloom_prefilter"](spark, sf_dir).collect()
    assert rows and all(r["in_bloom"] for r in rows)
    # candidate pressure: bloom candidates sit between the exact matches
    # and the whole table (strictly fewer than the table unless saturated)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    bits = urgent.agg(
        F.collect_set(F.pmod(F.xxhash64("o_custkey"), F.lit(8192))).alias("bits")
    )
    n_cand = (
        c.crossJoin(F.broadcast(bits))
        .where(F.array_contains("bits", F.pmod(F.xxhash64("c_custkey"), F.lit(8192))))
        .count()
    )
    assert len(rows) <= n_cand <= c.count()


def test_dup_span_fraction_bounds_on_fixture(spark, sf_dir):
    res = q.QUERIES["text_dup_span_fraction"](spark, sf_dir)
    rows = {r["doc_id"]: r for r in res.collect()}
    assert rows
    for r in rows.values():
        assert 0.0 <= r["dup_frac"] <= 1.0
        assert 0 <= r["n_dup_grams"] <= r["n_grams"]


def test_dup_span_fraction_planted_corpus(spark):
    # exact-dup pair (1, 2): every gram shared -> dup_frac == 1.0;
    # doc 3 shares only its first 5-gram with doc 4's prefix; doc 5 is
    # unique and shares nothing; doc 6 is too short for any 5-gram.
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, "alpha beta gamma delta epsilon unique tail words here"),
            (4, "alpha beta gamma delta epsilon different continuation text"),
            (5, "totally unrelated content with no shared shingles at all"),
            (6, "too short"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dup_span_fraction(docs, n=5).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}  # doc 6 has no 5-grams
    assert rows[1]["dup_frac"] == 1.0 and rows[2]["dup_frac"] == 1.0
    # docs 3/4 share exactly one gram: 'alpha beta gamma delta epsilon'
    assert rows[3]["n_dup_grams"] == 1 and rows[4]["n_dup_grams"] == 1
    assert rows[3]["dup_frac"] == 1 / rows[3]["n_grams"]
    assert rows[5]["n_dup_grams"] == 0 and rows[5]["dup_frac"] == 0.0


def test_zorder_tiles_cover_exactly_one_block(spark, sf_dir):
    rows = q.QUERIES["layout_zorder_locality"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_xblocks"] == 1 and r["n_yblocks"] == 1
        assert 1 <= r["n_cells"] <= 64
        # the tile id itself re-interleaves the block coordinates
        assert 0 <= r["ztile"] < 1024


def test_corr_components_agree_with_builtin(spark, sf_dir):
    res = {r["l_returnflag"]: r for r in q.QUERIES["agg_corr_covar"](spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    ref = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("c"),
            F.covar_pop("l_quantity", "l_extendedprice").alias("v"),
        )
        .collect()
    }
    assert set(res) == set(ref)
    for flag, r in res.items():
        assert abs(r["corr_qp"] - ref[flag]["c"]) < 1e-3
        assert abs(r["covar_pop"] - ref[flag]["v"]) < 1e-3 * max(1.0, abs(ref[flag]["v"]))


def test_market_basket_lift_agrees_with_direct_counts(spark, sf_dir):
    rows = q.QUERIES["market_basket_lift"](spark, sf_dir).collect()
    assert rows
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    from collections import defaultdict

    by_order = defaultdict(set)
    for r in items:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    part_n = defaultdict(int)
    pair_n = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for p in ps:
            part_n[p] += 1
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_n[(ps[i], ps[j])] += 1
    n_orders = len(by_order)
    expected = {k: v for k, v in pair_n.items() if v >= 2}
    assert len(rows) == len(expected)
    for r in rows[:50]:
        k = (r["part_a"], r["part_b"])
        assert pair_n[k] == r["n_pair"]
        lift = r["n_pair"] * n_orders / (part_n[k[0]] * part_n[k[1]])
        assert abs(r["lift"] - lift) < 1e-12
        assert r["part_a"] < r["part_b"]


def test_outliers_match_builtin_stats(spark, sf_dir):
    rows = q.QUERIES["events_value_outliers"](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    stats = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.avg("value").alias("m"), F.stddev_pop("value").alias("s")
        )
        .collect()
    }
    flagged = {r["event_id"] for r in rows}
    for r in rows:
        st = stats[r["event_type"]]
        z = (r["value"] - st["m"]) / st["s"]
        assert abs(z) > 2.999  # decimal-truncated stats vs float stats
        assert abs(round(z, 4) - r["z"]) < 2e-3
    # completeness: every |z| > 3.001 event under builtin stats is flagged
    for er in ev.collect():
        st = stats[er["event_type"]]
        z = (er["value"] - st["m"]) / st["s"]
        if abs(z) > 3.001:
            assert er["event_id"] in flagged


def test_pagerank_step_mass_conservation_and_naive_reference(spark, sf_dir):
    """One power-iteration step from uniform init conserves probability
    mass on the symmetric co-purchase graph (every dst is also a src
    with the same degree), and matches a driver-side naive recompute."""
    from collections import Counter, defaultdict

    rows = q.QUERIES["graph_pagerank_step"](spark, sf_dir).collect()
    assert rows
    # contrib is rounded at 4dp per node, so mass is 1 within n*5e-5
    assert abs(sum(r["pagerank"] for r in rows) - 1.0) < len(rows) * 5e-5 + 1e-9

    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    per_order = defaultdict(set)
    for r in items:
        per_order[r["l_orderkey"]].add(r["l_partkey"])
    pair_n = Counter()
    for ps in per_order.values():
        for x in ps:
            for y in ps:
                if x != y:
                    pair_n[(x, y)] += 1
    edges = [p for p, n in pair_n.items() if n >= 2]
    outdeg = Counter(src for src, _ in edges)
    contrib = defaultdict(float)
    for src, dst in edges:
        contrib[dst] += 1.0 / outdeg[src]
    got = {r["part"]: r for r in rows}
    assert set(got) == set(contrib)
    n_nodes = len(contrib)
    for part, r in got.items():
        assert r["degree"] == sum(1 for _, d in edges if d == part)
        assert abs(r["contrib"] - round(contrib[part], 4)) < 1e-3
        assert abs(r["pagerank"] - (0.15 + 0.85 * r["contrib"]) / n_nodes) < 1e-12


def test_triangle_count_matches_brute_force(spark, sf_dir):
    import duckdb

    row = q.QUERIES["graph_triangle_count"](spark, sf_dir).collect()[0]
    edges = duckdb.sql(f"""
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
                     FROM '{sf_dir}/lineitem.parquet'),
      e AS (SELECT a.l_partkey u, b.l_partkey v FROM items a JOIN items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT u, v FROM e
    """).fetchall()
    eset = set(map(tuple, edges))
    adj = {}
    for u, v in eset:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # for each canonical (u<v) edge, common neighbors w with w > v close
    # exactly the triangles anchored at that edge — each counted once
    tri = sum(1 for u, v in eset for w in (adj[u] & adj[v]) if w > v)
    wedges = sum(d * (d - 1) // 2 for d in (len(s) for s in adj.values()))
    assert row["n_edges"] == len(eset)
    assert row["n_triangles"] == tri
    assert row["n_wedges"] == wedges
