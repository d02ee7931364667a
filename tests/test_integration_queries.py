"""Semantic properties of the round-5 integration/retrieval batches —
beyond the DuckDB twins (which certify engine parity, not meaning):
the FS decision bands must match the corruption model, quantile
normalization must actually equalize source distributions, RRF must
respect its consensus theorem, and TWAP must differ from the naive
mean it corrects."""

from __future__ import annotations

import distgrep_spark.queries as q
from distgrep_spark.sources.catalog import load_table
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_fellegi_sunter_bands_match_corruption_model(spark):
    """The synthetic directory plants: a deletion variant for every
    custkey % 13 == 0 (scores 11000 -> link), a substitution variant
    for every custkey % 7 == 0 (scores 5700 -> possible), and for
    custkey % 91 == 0 BOTH variants, whose cross pair scores 700 ->
    possible. So: n_link == #del, n_possible == #sub + #both (plus any
    random 6-hex-prefix block collisions, which score negative and
    land in non_link)."""
    rows = {
        r["decision"]: r
        for r in q.QUERIES["er_fellegi_sunter_score"](spark, SF).collect()
    }
    keys = [
        r["c_custkey"]
        for r in load_table(spark, SF, "customer").select("c_custkey").collect()
    ]
    n_del = sum(1 for k in keys if k % 13 == 0)
    n_sub = sum(1 for k in keys if k % 7 == 0)
    n_both = sum(1 for k in keys if k % 91 == 0)
    assert rows["link"]["n_pairs"] == n_del
    assert rows["link"]["min_score"] == 11000 == rows["link"]["max_score"]
    assert rows["possible"]["n_pairs"] == n_sub + n_both
    assert rows["possible"]["max_score"] == 5700
    if "non_link" in rows:
        assert rows["non_link"]["max_score"] < 0


def test_quantile_normalize_equalizes_source_means(spark):
    """The point of quantile normalization: after mapping every doc to
    the pooled value at its within-source rank, the per-source MEANS
    must be far closer together than the raw per-source means (exactly
    equal only for equal-sized sources; the fixture's sources differ
    by a few docs)."""
    norm = q.QUERIES["corpus_quantile_normalize"](spark, SF).collect()
    raw = (
        load_table(spark, SF, "documents")
        .groupBy("source")
        .agg((F.sum("n_chars") / F.count("*")).alias("m"))
        .collect()
    )
    raw_spread = max(r["m"] for r in raw) - min(r["m"] for r in raw)
    norm_means = [r["mean_norm"] for r in norm]
    norm_spread = max(norm_means) - min(norm_means)
    assert len(norm) == len(raw)
    assert norm_spread < raw_spread / 2, (norm_spread, raw_spread)
    assert any(r["total_shift"] > 0 for r in norm)  # non-vacuous mapping


def test_rrf_consensus_theorem(spark):
    """If a candidate is rank 1 in BOTH arms its fused score
    2*floor(1e6/61) strictly beats any other candidate's maximum
    (rank-2 + rank-1 is impossible for another doc when rank 1 of each
    arm is the same doc), so it must hold fused_rank 1."""
    fused = q.QUERIES["sim_rrf_fusion"](spark, SF).collect()
    adc = q.QUERIES["sim_ann_pq_adc"](spark, SF).collect()
    adc_top1 = {r["query_id"]: r["vec_id"] for r in adc if r["rank"] == 1}
    fused_by_q = {}
    for r in fused:
        fused_by_q.setdefault(r["query_id"], {})[r["vec_id"]] = r
    for qid, rows in fused_by_q.items():
        both_top = [
            v
            for v, r in rows.items()
            if r["rrf_score"] == 2 * (1000000 // 61)
        ]
        for v in both_top:
            assert rows[v]["fused_rank"] == 1, (qid, v)
            assert adc_top1.get(qid) == v
        # every fused score is a sum of at most two RRF contributions
        for v, r in rows.items():
            assert 0 < r["rrf_score"] <= 2 * (1000000 // 61)


def test_twap_differs_from_naive_mean(spark):
    """TWAP corrects sampling-density bias; on the bursty fixture it
    must not collapse to the per-event mean for every type (if it did,
    the dwell weighting would be vacuous)."""
    tw = {r["event_type"]: r for r in q.QUERIES["events_twap"](spark, SF).collect()}
    naive = {
        r["event_type"]: r["m"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg((F.sum(F.expr("floor(value * 1000 + 0.5)")) / F.count("*")).alias("m"))
        .collect()
    }
    assert tw, "no twap rows"
    diffs = [abs(tw[t]["twap_milli"] - naive[t]) for t in tw]
    assert max(diffs) > 1.0, diffs  # >1 milli-unit somewhere
    for t, r in tw.items():
        assert r["dwell_us"] > 0 and r["n_intervals"] > 0


def test_mv_incremental_certificate_is_zero_mismatch(spark):
    row = q.QUERIES["mv_incremental_maintain"](spark, SF).collect()[0]
    assert row["n_mismatch"] == 0
    assert row["n_keys"] > 0 and row["total_orders"] > 0


def test_bm25_rare_term_dominates(spark):
    """Query 0 pairs 'dup' (df ~5%) with 'scan' (df ~80%): a doc
    containing the rare term must outrank docs with only the common
    term — concretely, every top-3 result for query 0 contains 'dup'."""
    rows = q.QUERIES["text_bm25_topk"](spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").collect()
    }
    q0 = sorted((r for r in rows if r["query_id"] == 0), key=lambda r: r["rank"])
    assert q0 and q0[0]["rank"] == 1
    for r in q0[:3]:
        assert "dup" in docs[r["doc_id"]].split(), r
    # scores strictly ordered (ties impossible on this fixture's top-10)
    scores = [r["score"] for r in q0]
    assert scores == sorted(scores, reverse=True)
