"""Property tests for the round-3 batch-5 analytics queries (DuckDB value
parity itself is covered by tools/check_oracles.py)."""

from __future__ import annotations

import re

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
    probes = {r["p_partkey"] for r in p.where("p_partkey % 7 = 0").collect()}
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
