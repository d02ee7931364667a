"""Round-9 batch: annotation/eval QA kernels + the CoGroupedMap surface.

The missing family a labeling/RLHF pipeline needs before any preference
data ships: inter-annotator agreement (Cohen's kappa for rater pairs,
Fleiss' kappa + Krippendorff's alpha for panels), paired-classifier
comparison (McNemar), and the precision/recall/F1 threshold sweep that
sets every quality-filter cutoff. Plus ``udf_cogroup_reconcile``, which
exercises ``DataFrame.groupBy().cogroup().applyInPandas`` — the one
Pandas-on-Spark API surface the registry did not yet cover.

Rater panel synthesis (deterministic, engine-portable): the "truth"
label is a length rule (``n_chars >= 300`` — the fixture median is 306,
so both classes are populated at every SF), and rater ``k`` reports
truth XOR a pseudo-random flip drawn from one hex digit of
``md5('iaa<k>:' || doc_id)`` — flip rates 2/16, 3/16, 4/16. md5 of a
VARCHAR is bit-identical in Spark and DuckDB (the
sample_reservoir_per_key idiom), so the panel is the same on both
engines and under any partitioning.

Exactness discipline: every statistic here is a single DOUBLE division
of two exact integers. Counts stay BIGINT; count PRODUCTS (N², T1·T0,
(|b−c|−1)²) are computed in DECIMAL(13,0)×DECIMAL(13,0) → DECIMAL(27,0)
on both engines, which stays exact to per-group N = 10^12 rows — the
orders_gini_spend x64 lesson (Σ-of-products accumulators overflow two
decades above where the docstring margin was quoted) applied up front.

The 100-TB view: every query is one scan + one map-side-combinable
aggregate; the shuffle carries a handful of counters per group, never
rows. The threshold sweep is ONE pass with 8×3 conditional sums — not a
docs×thresholds replication join. Reference: massimostanzione/distgrep
is grep-only (worker.go:24-43); eval/annotation extension surface per
SURVEY.md §2.2 (north-star training-data operators).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distgrep_spark.queries.registry import query
from distgrep_spark.sources.catalog import load_table

_TRUTH = "(n_chars >= 300)"


def _flip(rater: int, k: int) -> str:
    """Engine-portable Bernoulli(k/16) flip from one md5 hex digit."""
    return (
        "(instr('0123456789abcdef', substr(md5(concat("
        f"'iaa{rater}:', CAST(doc_id AS STRING))), 1, 1)) <= {k})"
    )


def _rater(rater: int, k: int) -> str:
    """Rater label as 0/1 INT: truth XOR flip (boolean != is XOR)."""
    return f"CAST({_TRUTH} != {_flip(rater, k)} AS INT)"


# ---------------------------------------------------------------------------
# Cohen's kappa (rater pair), per language


@query(
    "eval_cohen_kappa",
    oracle=f"""
    WITH labeled AS (
      SELECT lang, {_rater(1, 2)} AS r1, {_rater(2, 3)} AS r2
      FROM documents
    ),
    c AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(r1 * r2) AS BIGINT) AS n11,
             CAST(sum((1 - r1) * (1 - r2)) AS BIGINT) AS n00,
             CAST(sum(r1) AS BIGINT) AS a1,
             CAST(sum(r2) AS BIGINT) AS b1
      FROM labeled GROUP BY lang
    ),
    w AS (
      SELECT lang, n_docs, n11 + n00 AS n_agree,
             CAST(a1 AS DECIMAL(13,0)) * CAST(b1 AS DECIMAL(13,0))
               + CAST(n_docs - a1 AS DECIMAL(13,0))
                 * CAST(n_docs - b1 AS DECIMAL(13,0)) AS pe_num,
             CAST(n_docs AS DECIMAL(13,0))
               * CAST(n_docs AS DECIMAL(13,0)) AS nsq
      FROM c
    )
    SELECT lang, n_docs, CAST(n_agree AS BIGINT) AS n_agree,
           CAST(n_agree AS DOUBLE) / CAST(n_docs AS DOUBLE) AS po,
           CAST(pe_num AS DOUBLE) / CAST(nsq AS DOUBLE) AS pe,
           CASE WHEN nsq - pe_num = 0 THEN NULL
                ELSE CAST(CAST(n_docs AS DECIMAL(13,0))
                            * CAST(n_agree AS DECIMAL(13,0))
                          - pe_num AS DOUBLE)
                     / CAST(nsq - pe_num AS DOUBLE) END AS kappa
    FROM w
    """,
)
def q_eval_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic raters, per language —
    the pairwise inter-annotator-agreement gate every labeling vendor
    report leads with. kappa = (p_o − p_e)/(1 − p_e) computed as ONE
    DOUBLE division of exact integers: numerator N·n_agree − pe_num and
    denominator N² − pe_num, with the two count products in
    DECIMAL(13,0)² = DECIMAL(27,0) (exact to N = 10^12 per language; the 3N-scale terms in the Fleiss/Krippendorff pair clear the 13-digit cast until N ≈ 3.3e12).

    Plan: one documents scan, per-doc labels in a map-side project (two
    md5 calls), one hash aggregate keyed on lang carrying five BIGINT
    counters. At 100 TB the shuffle moves 5 numbers per language —
    agreement over any corpus costs the same exchange as a count.
    Reference: massimostanzione/distgrep worker.go:31-42 is the
    map-side-combine ancestor; the kappa algebra is Cohen 1960.
    """
    labeled = load_table(spark, sf_dir, "documents").selectExpr(
        "lang", f"{_rater(1, 2)} AS r1", f"{_rater(2, 3)} AS r2"
    )
    c = labeled.groupBy("lang").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_docs"),
        F.expr("CAST(sum(r1 * r2) AS BIGINT) AS n11"),
        F.expr("CAST(sum((1 - r1) * (1 - r2)) AS BIGINT) AS n00"),
        F.expr("CAST(sum(r1) AS BIGINT) AS a1"),
        F.expr("CAST(sum(r2) AS BIGINT) AS b1"),
    )
    w = c.selectExpr(
        "lang",
        "n_docs",
        "n11 + n00 AS n_agree",
        "CAST(a1 AS DECIMAL(13,0)) * CAST(b1 AS DECIMAL(13,0))"
        " + CAST(n_docs - a1 AS DECIMAL(13,0))"
        "   * CAST(n_docs - b1 AS DECIMAL(13,0)) AS pe_num",
        "CAST(n_docs AS DECIMAL(13,0)) * CAST(n_docs AS DECIMAL(13,0)) AS nsq",
    )
    return w.selectExpr(
        "lang",
        "n_docs",
        "CAST(n_agree AS BIGINT) AS n_agree",
        "CAST(n_agree AS DOUBLE) / CAST(n_docs AS DOUBLE) AS po",
        "CAST(pe_num AS DOUBLE) / CAST(nsq AS DOUBLE) AS pe",
        "CASE WHEN nsq - pe_num = 0 THEN NULL"
        "     ELSE CAST(CAST(n_docs AS DECIMAL(13,0))"
        "                 * CAST(n_agree AS DECIMAL(13,0))"
        "               - pe_num AS DOUBLE)"
        "          / CAST(nsq - pe_num AS DOUBLE) END AS kappa",
    )


# ---------------------------------------------------------------------------
# Fleiss' kappa + Krippendorff's alpha (3-rater panel), per language


@query(
    "eval_fleiss_kappa",
    oracle=f"""
    WITH labeled AS (
      SELECT lang,
             {_rater(1, 2)} + {_rater(2, 3)} + {_rater(3, 4)} AS n1
      FROM documents
    ),
    c AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n1 * n1 + (3 - n1) * (3 - n1)) AS BIGINT) AS s_sq,
             CAST(sum(n1) AS BIGINT) AS t1,
             CAST(sum(n1 * (3 - n1)) AS BIGINT) AS d_sum
      FROM labeled GROUP BY lang
    ),
    w AS (
      SELECT lang, n_docs, s_sq, t1, d_sum, 3 * n_docs - t1 AS t0,
             CAST(t1 AS DECIMAL(13,0)) * CAST(t1 AS DECIMAL(13,0))
               + CAST(3 * n_docs - t1 AS DECIMAL(13,0))
                 * CAST(3 * n_docs - t1 AS DECIMAL(13,0)) AS tsq,
             CAST(t1 AS DECIMAL(13,0))
               * CAST(3 * n_docs - t1 AS DECIMAL(13,0)) AS tt,
             CAST(n_docs AS DECIMAL(13,0))
               * CAST(n_docs AS DECIMAL(13,0)) AS nsq
      FROM c
    )
    SELECT lang, n_docs,
           CAST(s_sq - 3 * n_docs AS DOUBLE)
             / CAST(6 * n_docs AS DOUBLE) AS p_o,
           CASE WHEN 18 * nsq - 2 * tsq = 0 THEN NULL
                ELSE CAST(CAST(3 * n_docs AS DECIMAL(13,0))
                            * CAST(s_sq - 3 * n_docs AS DECIMAL(13,0))
                          - 2 * tsq AS DOUBLE)
                     / CAST(18 * nsq - 2 * tsq AS DOUBLE) END AS fleiss_kappa,
           CASE WHEN tt = 0 THEN NULL
                ELSE CAST(2 * tt
                          - CAST(3 * n_docs - 1 AS DECIMAL(13,0))
                            * CAST(d_sum AS DECIMAL(13,0)) AS DOUBLE)
                     / CAST(2 * tt AS DOUBLE) END AS kripp_alpha
    FROM w
    """,
)
def q_eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa and Krippendorff's alpha for a 3-rater binary
    panel, per language — the multi-rater agreement pair (kappa with
    the classic chance model, alpha with the pooled-pairs one). Both
    reduce to exact integer sufficient statistics per group:
    S = Σᵢ(nᵢ₁² + nᵢ₀²), T₁ = Σᵢnᵢ₁, D = Σᵢnᵢ₁·nᵢ₀. Cleared of
    denominators (×18N² for kappa, ×2T₁T₀(R−1) for alpha) each metric
    is one DOUBLE division of DECIMAL(27,0)-exact integers:
      kappa = (3N(S−3N) − 2(T₁²+T₀²)) / (18N² − 2(T₁²+T₀²))
      alpha = (2T₁T₀ − (3N−1)·D) / (2T₁T₀)            [R=3, nominal]

    Plan: one scan, three md5s per row, one lang-keyed aggregate of
    four BIGINT counters — the agreement panel over 100 TB of
    annotations is map-side-combined like a count. Degenerate groups
    (unanimous constant panel → zero denominator) yield NULL on both
    engines rather than an ANSI divide-by-zero throw (the
    stats_ab_power_mde lesson). Reference: Fleiss 1971; Krippendorff
    2004 (nominal metric, equal raters per unit).
    """
    labeled = load_table(spark, sf_dir, "documents").selectExpr(
        "lang",
        f"{_rater(1, 2)} + {_rater(2, 3)} + {_rater(3, 4)} AS n1",
    )
    c = labeled.groupBy("lang").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_docs"),
        F.expr("CAST(sum(n1 * n1 + (3 - n1) * (3 - n1)) AS BIGINT) AS s_sq"),
        F.expr("CAST(sum(n1) AS BIGINT) AS t1"),
        F.expr("CAST(sum(n1 * (3 - n1)) AS BIGINT) AS d_sum"),
    )
    w = c.selectExpr(
        "lang",
        "n_docs",
        "s_sq",
        "t1",
        "d_sum",
        "CAST(t1 AS DECIMAL(13,0)) * CAST(t1 AS DECIMAL(13,0))"
        " + CAST(3 * n_docs - t1 AS DECIMAL(13,0))"
        "   * CAST(3 * n_docs - t1 AS DECIMAL(13,0)) AS tsq",
        "CAST(t1 AS DECIMAL(13,0))"
        " * CAST(3 * n_docs - t1 AS DECIMAL(13,0)) AS tt",
        "CAST(n_docs AS DECIMAL(13,0)) * CAST(n_docs AS DECIMAL(13,0)) AS nsq",
    )
    return w.selectExpr(
        "lang",
        "n_docs",
        "CAST(s_sq - 3 * n_docs AS DOUBLE)"
        " / CAST(6 * n_docs AS DOUBLE) AS p_o",
        "CASE WHEN 18 * nsq - 2 * tsq = 0 THEN NULL"
        "     ELSE CAST(CAST(3 * n_docs AS DECIMAL(13,0))"
        "                 * CAST(s_sq - 3 * n_docs AS DECIMAL(13,0))"
        "               - 2 * tsq AS DOUBLE)"
        "          / CAST(18 * nsq - 2 * tsq AS DOUBLE) END AS fleiss_kappa",
        "CASE WHEN tt = 0 THEN NULL"
        "     ELSE CAST(2 * tt"
        "               - CAST(3 * n_docs - 1 AS DECIMAL(13,0))"
        "                 * CAST(d_sum AS DECIMAL(13,0)) AS DOUBLE)"
        "          / CAST(2 * tt AS DOUBLE) END AS kripp_alpha",
    )


# ---------------------------------------------------------------------------
# McNemar's paired test (two classifiers on the same examples)

_NOISE = (
    "(instr('0123456789abcdef', substr(md5(concat("
    "'mcn:', CAST(doc_id AS STRING))), 1, 1)) - 1) * 4"
)


@query(
    "eval_mcnemar_paired",
    oracle=f"""
    WITH labeled AS (
      SELECT CAST((n_chars >= 280) = {_TRUTH} AS INT) AS acc_a,
             CAST((n_chars + {_NOISE} >= 300) = {_TRUTH} AS INT) AS acc_b
      FROM documents
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(acc_a * acc_b) AS BIGINT) AS n_both_right,
             CAST(sum(acc_a * (1 - acc_b)) AS BIGINT) AS b_only_a,
             CAST(sum((1 - acc_a) * acc_b) AS BIGINT) AS c_only_b
      FROM labeled
    ),
    w AS (
      SELECT n_docs, n_both_right, b_only_a, c_only_b,
             CAST(greatest(abs(b_only_a - c_only_b) - 1, 0)
                  AS DECIMAL(13,0))
               * CAST(greatest(abs(b_only_a - c_only_b) - 1, 0)
                      AS DECIMAL(13,0)) AS corr_sq,
             b_only_a + c_only_b AS disc
      FROM c
    )
    SELECT n_docs, n_both_right, b_only_a, c_only_b,
           CASE WHEN disc = 0 THEN NULL
                ELSE CAST(corr_sq AS DOUBLE) / CAST(disc AS DOUBLE)
                END AS mcnemar_stat,
           CASE WHEN disc = 0 THEN NULL
                ELSE 1000000 * corr_sq
                     > 3841459 * CAST(disc AS DECIMAL(13,0)) END AS reject
    FROM w
    """,
)
def q_eval_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test with continuity correction — the paired design
    for "is classifier B better than A on the SAME examples", the
    standard readout when two quality filters are compared on one
    corpus. Only the discordant counts matter: b (A right, B wrong),
    c (B right, A wrong); statistic (|b−c|−1)²/(b+c) against the
    χ²₁ 5% critical value.

    Exactness: the reject boolean does NOT compare a DOUBLE against
    3.841459 — it cross-multiplies: 10⁶·(|b−c|−1)² > 3841459·(b+c) in
    DECIMAL(27,0)-scale integers, so the decision is exact on both engines
    regardless of division rounding (same discipline as
    stats_ab_ztest's 1.96 gate, but with zero float ops at all).
    Degenerate b+c = 0 → NULL stat/decision, not a throw.

    Plan: one scan, one ungrouped aggregate of four counters — the
    whole paired comparison over 100 TB shuffles four BIGINTs.
    Reference: McNemar 1947; Edwards 1948 continuity correction.
    """
    labeled = load_table(spark, sf_dir, "documents").selectExpr(
        f"CAST((n_chars >= 280) = {_TRUTH} AS INT) AS acc_a",
        f"CAST((n_chars + {_NOISE} >= 300) = {_TRUTH} AS INT) AS acc_b",
    )
    c = labeled.agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_docs"),
        F.expr("CAST(sum(acc_a * acc_b) AS BIGINT) AS n_both_right"),
        F.expr("CAST(sum(acc_a * (1 - acc_b)) AS BIGINT) AS b_only_a"),
        F.expr("CAST(sum((1 - acc_a) * acc_b) AS BIGINT) AS c_only_b"),
    )
    w = c.selectExpr(
        "n_docs",
        "n_both_right",
        "b_only_a",
        "c_only_b",
        "CAST(greatest(abs(b_only_a - c_only_b) - 1, 0) AS DECIMAL(13,0))"
        " * CAST(greatest(abs(b_only_a - c_only_b) - 1, 0) AS DECIMAL(13,0))"
        " AS corr_sq",
        "b_only_a + c_only_b AS disc",
    )
    return w.selectExpr(
        "n_docs",
        "n_both_right",
        "b_only_a",
        "c_only_b",
        "CASE WHEN disc = 0 THEN NULL"
        "     ELSE CAST(corr_sq AS DOUBLE) / CAST(disc AS DOUBLE)"
        "     END AS mcnemar_stat",
        "CASE WHEN disc = 0 THEN NULL"
        "     ELSE 1000000 * corr_sq"
        "          > 3841459 * CAST(disc AS DECIMAL(13,0)) END AS reject",
    )


# ---------------------------------------------------------------------------
# Precision / recall / F1 threshold sweep (one pass, no replication join)

_PR_THRESHOLDS = [260, 280, 300, 320, 340, 360, 380, 400]
_PR_SCORE = (
    "n_chars + (instr('0123456789abcdef', substr(md5(concat("
    "'prs:', CAST(doc_id AS STRING))), 1, 1)) - 1) * 4"
)


def _pr_sums() -> list[str]:
    out = []
    for t in _PR_THRESHOLDS:
        out += [
            f"CAST(sum(CASE WHEN score >= {t} AND y = 1 THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS tp_{t}",
            f"CAST(sum(CASE WHEN score >= {t} AND y = 0 THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS fp_{t}",
            f"CAST(sum(CASE WHEN score < {t} AND y = 1 THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS fn_{t}",
        ]
    return out


_PR_METRICS = """
    SELECT threshold, tp, fp, fn,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                END AS precision,
           CASE WHEN tp + fn = 0 THEN NULL
                ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
                END AS recall,
           CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                ELSE CAST(2 * tp AS DOUBLE)
                     / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
"""


def _pr_oracle() -> str:
    sums = ",\n             ".join(_pr_sums())
    arms = "\n      UNION ALL\n".join(
        f"      SELECT CAST({t} AS BIGINT) AS threshold,"
        f" tp_{t} AS tp, fp_{t} AS fp, fn_{t} AS fn FROM c"
        for t in _PR_THRESHOLDS
    )
    return f"""
    WITH scored AS (
      SELECT {_PR_SCORE} AS score, CAST({_TRUTH} AS INT) AS y
      FROM documents
    ),
    c AS MATERIALIZED (
      SELECT {sums}
      FROM scored
    ),
    rows_out AS (
{arms}
    )
    {_PR_METRICS}
    FROM rows_out
    """


@query("eval_pr_threshold_sweep", oracle=_pr_oracle())
def q_eval_pr_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 across a fixed threshold grid for a
    noisy quality score against the length truth rule — the sweep that
    picks every quality-filter cutoff in a curation pipeline.

    The scale-defining choice: this is ONE pass with 8×3 conditional
    sums (map-side combined into a single 24-counter row), NOT a
    docs×thresholds cross join — the replication form multiplies a
    100-TB scan by the grid size; the conditional-sum form's cost is
    independent of it. Rows are produced by an 8-arm stack over the
    one aggregated row; each metric is a single DOUBLE division of
    exact BIGINTs with NULL-guarded degenerate denominators. The
    DuckDB twin's 8 UNION arms read an AS MATERIALIZED one-row CTE
    (the inlined-CTE re-execution trap). Reference: standard IR
    metrics; grep ancestor worker.go:31-42 (conditional count).
    """
    scored = load_table(spark, sf_dir, "documents").selectExpr(
        f"{_PR_SCORE} AS score", f"CAST({_TRUTH} AS INT) AS y"
    )
    c = scored.agg(*[F.expr(s) for s in _pr_sums()])
    stack_args = ", ".join(
        f"CAST({t} AS BIGINT), tp_{t}, fp_{t}, fn_{t}" for t in _PR_THRESHOLDS
    )
    rows_out = c.selectExpr(
        f"stack({len(_PR_THRESHOLDS)}, {stack_args})"
        " AS (threshold, tp, fp, fn)"
    )
    return rows_out.selectExpr(
        "threshold",
        "tp",
        "fp",
        "fn",
        "CASE WHEN tp + fp = 0 THEN NULL"
        "     ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)"
        "     END AS precision",
        "CASE WHEN tp + fn = 0 THEN NULL"
        "     ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)"
        "     END AS recall",
        "CASE WHEN 2 * tp + fp + fn = 0 THEN NULL"
        "     ELSE CAST(2 * tp AS DOUBLE)"
        "          / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1",
    )


# ---------------------------------------------------------------------------
# Gold-seeded Dawid-Skene assignment (one E-step, pattern-collapsed)

_DS_R1 = (  # accurate symmetric rater: truth XOR Bernoulli(1/16)
    "CAST((n_chars >= 300) != (instr('0123456789abcdef', substr(md5(concat("
    "'iaa4:', CAST(doc_id AS STRING))), 1, 1)) <= 1) AS INT)"
)
_DS_R2 = (  # lenient rater: truth OR Bernoulli(6/16) — false positives only
    "CAST((n_chars >= 300) OR (instr('0123456789abcdef', substr(md5(concat("
    "'iaa5:', CAST(doc_id AS STRING))), 1, 1)) <= 6) AS INT)"
)
_DS_R3 = (  # lenient rater: truth OR Bernoulli(7/16)
    "CAST((n_chars >= 300) OR (instr('0123456789abcdef', substr(md5(concat("
    "'iaa6:', CAST(doc_id AS STRING))), 1, 1)) <= 7) AS INT)"
)
_DS_GOLD = (
    "CASE WHEN n_chars >= 450 THEN 1 WHEN n_chars < 150 THEN 0"
    " ELSE NULL END"
)

_DS_SCORES = """
      CAST(g1 + 1 AS DOUBLE)
        * CAST(CASE WHEN r1 = 1 THEN a1 + 1 ELSE g1 - a1 + 1 END AS DOUBLE)
        * CAST(CASE WHEN r2 = 1 THEN a2 + 1 ELSE g1 - a2 + 1 END AS DOUBLE)
        * CAST(CASE WHEN r3 = 1 THEN a3 + 1 ELSE g1 - a3 + 1 END AS DOUBLE)
        * CAST(g0 + 2 AS DOUBLE) * CAST(g0 + 2 AS DOUBLE)
        * CAST(g0 + 2 AS DOUBLE) AS s1,
      CAST(g0 + 1 AS DOUBLE)
        * CAST(CASE WHEN r1 = 1 THEN d1 + 1 ELSE g0 - d1 + 1 END AS DOUBLE)
        * CAST(CASE WHEN r2 = 1 THEN d2 + 1 ELSE g0 - d2 + 1 END AS DOUBLE)
        * CAST(CASE WHEN r3 = 1 THEN d3 + 1 ELSE g0 - d3 + 1 END AS DOUBLE)
        * CAST(g1 + 2 AS DOUBLE) * CAST(g1 + 2 AS DOUBLE)
        * CAST(g1 + 2 AS DOUBLE) AS s0
"""

_DS_FINAL = """
    SELECT r1, r2, r3, n_docs,
           CAST(r1 + r2 + r3 >= 2 AS INT) AS majority,
           CASE WHEN s1 > s0 THEN 1 WHEN s1 < s0 THEN 0
                ELSE CAST(r1 + r2 + r3 >= 2 AS INT) END AS ds_label,
           CASE WHEN s1 + s0 = CAST(0 AS DOUBLE) THEN NULL
                ELSE s1 / (s1 + s0) END AS posterior
"""


@query(
    "eval_dawid_skene_gold",
    oracle=f"""
    WITH lab AS (
      SELECT {_DS_R1} AS r1, {_DS_R2} AS r2, {_DS_R3} AS r3,
             {_DS_GOLD} AS gold
      FROM documents
    ),
    c AS (
      SELECT
        CAST(sum(CASE WHEN gold = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1,
        CAST(sum(CASE WHEN gold = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g0,
        CAST(sum(CASE WHEN gold = 1 THEN r1 ELSE 0 END) AS BIGINT) AS a1,
        CAST(sum(CASE WHEN gold = 1 THEN r2 ELSE 0 END) AS BIGINT) AS a2,
        CAST(sum(CASE WHEN gold = 1 THEN r3 ELSE 0 END) AS BIGINT) AS a3,
        CAST(sum(CASE WHEN gold = 0 THEN r1 ELSE 0 END) AS BIGINT) AS d1,
        CAST(sum(CASE WHEN gold = 0 THEN r2 ELSE 0 END) AS BIGINT) AS d2,
        CAST(sum(CASE WHEN gold = 0 THEN r3 ELSE 0 END) AS BIGINT) AS d3
      FROM lab
    ),
    pat AS (
      SELECT r1, r2, r3, CAST(count(*) AS BIGINT) AS n_docs
      FROM lab GROUP BY r1, r2, r3
    ),
    w AS (
      SELECT p.r1, p.r2, p.r3, p.n_docs,
      {_DS_SCORES}
      FROM pat p CROSS JOIN c
    )
    {_DS_FINAL}
    FROM w
    """,
)
def q_eval_dawid_skene_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-seeded Dawid-Skene truth inference (one E-step), pattern-
    collapsed — the canonical crowd-labeling correction for LENIENT
    annotators, the real-world failure mode where majority vote is
    systematically wrong. Per-rater confusion matrices are estimated
    on a gold anchor set (extreme-length docs: n_chars >= 450 / < 150 —
    both tails populated at every fixture SF, 92/90 at sf0.01) with
    add-one smoothing (zero cells are structural here: a lenient rater
    NEVER says 0 on a gold positive), then one posterior E-step
    reassigns every document. On the fixture panel (one accurate
    symmetric rater, two lenient over-approvers) DS flips ALL THREE
    2-vs-1 majority-positive patterns to 0 — a lenient rater's "1"
    carries almost no evidence, while its rare "0" is near-proof of a
    negative; pytest pins those flips and the textbook Fraction math.

    Profile collapse, the repo's signature move: the E-step is
    computed once per LABEL PATTERN (≤ 2³ rows), never per document —
    documents only carry their pattern through a count rollup, so the
    EM arithmetic is O(2^R) regardless of corpus size, and at 100 TB
    the whole step is two aggregates plus an 8-row broadcast.

    Exactness: smoothed-count scores reach 8N⁷ — past DECIMAL(38)/
    HUGEINT at the x64 corpus — so the score product is computed as a
    FIXED left-associated tree of doubles, each factor an exact
    integer cast once: IEEE multiply is correctly rounded, neither
    engine reassociates float arithmetic, and there are no float SUMS
    anywhere, so both engines produce bit-identical s1/s0/posterior
    under any partitioning (the stats_ab_ztest fixed-tree rule).
    Reference: Dawid & Skene 1979; gold seeding per standard labeling
    practice; grep ancestor worker.go:31-42 (conditional count).
    """
    lab = load_table(spark, sf_dir, "documents").selectExpr(
        f"{_DS_R1} AS r1",
        f"{_DS_R2} AS r2",
        f"{_DS_R3} AS r3",
        f"{_DS_GOLD} AS gold",
    )
    c = lab.agg(
        F.expr("CAST(sum(CASE WHEN gold = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1"),
        F.expr("CAST(sum(CASE WHEN gold = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g0"),
        F.expr("CAST(sum(CASE WHEN gold = 1 THEN r1 ELSE 0 END) AS BIGINT) AS a1"),
        F.expr("CAST(sum(CASE WHEN gold = 1 THEN r2 ELSE 0 END) AS BIGINT) AS a2"),
        F.expr("CAST(sum(CASE WHEN gold = 1 THEN r3 ELSE 0 END) AS BIGINT) AS a3"),
        F.expr("CAST(sum(CASE WHEN gold = 0 THEN r1 ELSE 0 END) AS BIGINT) AS d1"),
        F.expr("CAST(sum(CASE WHEN gold = 0 THEN r2 ELSE 0 END) AS BIGINT) AS d2"),
        F.expr("CAST(sum(CASE WHEN gold = 0 THEN r3 ELSE 0 END) AS BIGINT) AS d3"),
    )
    pat = lab.groupBy("r1", "r2", "r3").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_docs")
    )
    s1_expr, s0_expr = _DS_SCORES.split("AS s1,")
    w = pat.crossJoin(F.broadcast(c)).selectExpr(
        "r1",
        "r2",
        "r3",
        "n_docs",
        s1_expr.strip() + " AS s1",
        s0_expr.strip(),
    )
    return w.selectExpr(
        "r1",
        "r2",
        "r3",
        "n_docs",
        "CAST(r1 + r2 + r3 >= 2 AS INT) AS majority",
        "CASE WHEN s1 > s0 THEN 1 WHEN s1 < s0 THEN 0"
        "     ELSE CAST(r1 + r2 + r3 >= 2 AS INT) END AS ds_label",
        "CASE WHEN s1 + s0 = CAST(0 AS DOUBLE) THEN NULL"
        "     ELSE s1 / (s1 + s0) END AS posterior",
    )


# ---------------------------------------------------------------------------
# Bucketed CoGroupedMap reconcile (orders ledger vs shipment ledger)

_COGROUP_BUCKETS = 64


def _reconcile_buckets(orders_pdf, lines_pdf):
    # No type hints on this function: `from __future__ import
    # annotations` stringifies them and the Arrow signature resolver
    # can't eval function-local imports (CLAUDE.md pandas-UDF rule).
    import numpy as np

    if len(lines_pdf):
        qty = np.floor(lines_pdf["l_quantity"].to_numpy() + 0.5)
        cents = np.floor(
            lines_pdf["l_extendedprice"].to_numpy() * 100.0 + 0.5
        )
        lg = (
            pd.DataFrame(
                {
                    "orderkey": lines_pdf["l_orderkey"].to_numpy(),
                    "sum_qty": qty.astype("int64"),
                    "lines_cents": cents.astype("int64"),
                }
            )
            .groupby("orderkey", as_index=False)
            .agg(
                n_lines=("sum_qty", "size"),
                sum_qty=("sum_qty", "sum"),
                lines_cents=("lines_cents", "sum"),
            )
        )
    else:
        lg = pd.DataFrame(
            {
                "orderkey": pd.Series([], dtype="int64"),
                "n_lines": pd.Series([], dtype="int64"),
                "sum_qty": pd.Series([], dtype="int64"),
                "lines_cents": pd.Series([], dtype="int64"),
            }
        )
    heads = pd.DataFrame(
        {"orderkey": orders_pdf["o_orderkey"], "has_header": True}
    )
    out = heads.merge(lg, on="orderkey", how="outer")
    # .eq(True) maps the merge's NaN to False without the deprecated
    # object-dtype fillna downcast
    out["has_header"] = out["has_header"].eq(True)
    for col in ("n_lines", "sum_qty", "lines_cents"):
        out[col] = out[col].fillna(0).astype("int64")
    out["orderkey"] = out["orderkey"].astype("int64")
    return out[["orderkey", "n_lines", "sum_qty", "lines_cents", "has_header"]]


@query(
    "udf_cogroup_reconcile",
    oracle="""
    WITH l AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_qty,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS lines_cents
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1995-07-01 00:00:00'
      GROUP BY l_orderkey
    ),
    o AS (
      SELECT o_orderkey FROM orders
      WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    )
    SELECT COALESCE(o.o_orderkey, l.l_orderkey) AS orderkey,
           CAST(COALESCE(l.n_lines, 0) AS BIGINT) AS n_lines,
           CAST(COALESCE(l.sum_qty, 0) AS BIGINT) AS sum_qty,
           CAST(COALESCE(l.lines_cents, 0) AS BIGINT) AS lines_cents,
           o.o_orderkey IS NOT NULL AS has_header
    FROM o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey
    """,
)
def q_udf_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-ledger reconciliation via ``cogroup().applyInPandas`` — the
    CoGroupedMap API surface (the one Pandas-on-Spark entry point the
    registry didn't yet exercise). The 1996 order ledger is cogrouped
    against the pre-1995-07 shipment ledger; each side's universe
    deliberately overhangs the other (1,738 headerless-order and 3,211
    orphan-shipment groups at sf0.01, measured), so both outer classes
    are real.

    Bucketed, not keyed: cogrouping on raw o_orderkey would pay the
    per-GROUP pandas overhead at one group per order — the
    applyInPandasWithState lesson (37k rows/s at 50k tiny groups vs
    1.6M bucketed, streaming/stateful.py). Both sides hash into
    64 pmod(xxhash64) buckets (a REAL column, withColumn before
    groupBy), and the pandas fn does the per-bucket rollup + outer
    merge vectorized. At 100 TB the bucket count tracks shuffle
    partitions, so each Arrow batch is partition-sized and the Python
    boundary is crossed once per partition, not per key; a
    heavier-tailed lines side would pre-aggregate map-side first (the
    additive-sketch rule: shuffle digests, not rows).

    Exactness: integer outputs only; cents/qty via floor(x·100 + 0.5)
    — the repo-wide idiom both engines compute on the identical double
    (numpy floor == SQL floor; never round(), which is half-even in
    numpy and half-away in SQL). Reference: massimostanzione/distgrep
    server.go:176-191 (shuffle group-by-key ancestor); CoGroupedMap
    per SURVEY.md §2.2 UDF surface.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.expr("o_orderdate < TIMESTAMP '1996-01-01 00:00:00'"))
        .select("o_orderkey")
        .withColumn(
            "b", F.expr(f"pmod(xxhash64(o_orderkey), {_COGROUP_BUCKETS})")
        )
    )
    lines = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.expr("l_shipdate < TIMESTAMP '1995-07-01 00:00:00'"))
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .withColumn(
            "b", F.expr(f"pmod(xxhash64(l_orderkey), {_COGROUP_BUCKETS})")
        )
    )
    return orders.groupBy("b").cogroup(lines.groupBy("b")).applyInPandas(
        _reconcile_buckets,
        schema=(
            "orderkey long, n_lines long, sum_qty long,"
            " lines_cents long, has_header boolean"
        ),
    )


# ---------------------------------------------------------------------------
# Wilson lower-bound win-rate ranking (small-sample-aware leaderboard)

_WILSON_KEPT = """
      SELECT p_brand AS brand, l_returnflag
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE instr('0123456789abcdef',
                  substr(md5(concat(p_brand, ':',
                                    CAST(l_orderkey AS STRING), ':',
                                    CAST(l_linenumber AS STRING))), 1, 1))
            <= instr('0123456789abcdef', substr(md5(p_brand), 1, 1))
"""

_WILSON_SCORE = """
      (p_hat + CAST(3.8416 AS DOUBLE) / (2 * CAST(n AS DOUBLE))
       - CAST(1.96 AS DOUBLE)
         * sqrt(p_hat * (1 - p_hat) / CAST(n AS DOUBLE)
                + CAST(3.8416 AS DOUBLE)
                  / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
      / (1 + CAST(3.8416 AS DOUBLE) / CAST(n AS DOUBLE)) AS wilson_lb
"""


@query(
    "eval_winrate_wilson",
    oracle=f"""
    WITH kept AS (
      {_WILSON_KEPT}
    ),
    c AS (
      SELECT brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS wins
      FROM kept GROUP BY brand
    ),
    s AS (
      SELECT brand, n, wins,
             CAST(wins AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat
      FROM c
    ),
    w AS (
      SELECT brand, n, wins, p_hat,
      {_WILSON_SCORE}
      FROM s
    )
    SELECT brand, n, wins, p_hat, wilson_lb,
           CAST(rank() OVER (ORDER BY p_hat DESC, brand) AS BIGINT)
             AS rank_raw,
           CAST(rank() OVER (ORDER BY wilson_lb DESC, brand) AS BIGINT)
             AS rank_wilson
    FROM w
    """,
)
def q_eval_winrate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score lower-bound win-rate leaderboard — the
    small-sample-aware ranking correction (Wilson 1927; the "how not
    to sort by average rating" classic) every eval harness needs when
    per-system trial counts differ. Exposure heterogeneity is planted
    deterministically: each brand keeps a brand-dependent 1/16..16/16
    md5 slice of its line items (n spans 170..2,703 at sf0.01 — 16×),
    and ranking by the Wilson lower bound instead of the raw rate
    moves 23 of 25 rank positions (measured; pinned in pytest).

    Exactness: wins/n are exact BIGINTs off one map-side-combined
    rollup; the bound is a FIXED tree of correctly-rounded IEEE ops —
    div/sub/mul/sqrt only, constants routed through CAST(1.96/3.8416
    AS DOUBLE) so both engines bind the identical doubles (a bare
    3.8416 literal is DECIMAL in Spark SQL — the sample_neyman lesson)
    — so wilson_lb is bit-identical cross-engine and the rank ORDER BY
    on it is deterministic (brand tie-break). The two rank() windows
    run over the 25-row brand rollup (SP_WINDOW_ALLOWLIST: bounded by
    the brand dimension at any corpus size). At 100 TB: one broadcast
    dim join + one rollup exchange; the leaderboard math happens on
    |brands| rows. Reference: massimostanzione/distgrep worker.go:31-42
    (conditional count ancestor); Wilson interval per Brown-Cai-
    DasGupta 2001 recommendation.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_returnflag"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    kept = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .selectExpr(
            "p_brand AS brand",
            "l_returnflag",
            "instr('0123456789abcdef',"
            " substr(md5(concat(p_brand, ':',"
            " CAST(l_orderkey AS STRING), ':',"
            " CAST(l_linenumber AS STRING))), 1, 1)) AS h",
            "instr('0123456789abcdef', substr(md5(p_brand), 1, 1)) AS k",
        )
        .where("h <= k")
    )
    c = kept.groupBy("brand").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n"),
        F.expr(
            "CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS wins"
        ),
    )
    s = c.selectExpr(
        "brand", "n", "wins", "CAST(wins AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat"
    )
    w = s.selectExpr("brand", "n", "wins", "p_hat", _WILSON_SCORE.strip())
    return w.selectExpr(
        "brand",
        "n",
        "wins",
        "p_hat",
        "wilson_lb",
        "CAST(rank() OVER (ORDER BY p_hat DESC, brand) AS BIGINT)"
        " AS rank_raw",
        "CAST(rank() OVER (ORDER BY wilson_lb DESC, brand) AS BIGINT)"
        " AS rank_wilson",
    )


# ---------------------------------------------------------------------------
# Annotation-QA flagship: kappa gate -> DS relabel -> gold-holdout audit

_AQA_CELLS = f"""
      SELECT lang, {_DS_R1} AS r1, {_DS_R2} AS r2, {_DS_R3} AS r3,
             {_DS_GOLD} AS gold,
             CAST(count(*) AS BIGINT) AS cnt
      FROM documents
      GROUP BY 1, 2, 3, 4, 5
"""

# One expression per counter, shared verbatim by the Spark aggregate list
# and the oracle SQL (round-9 ADVICE: never parse the SQL fragment back
# into expressions — a reflow of the string would silently break one side).
_AQA_COUNTER_EXPRS = [
    "CAST(sum(CASE WHEN gold = 1 THEN cnt ELSE 0 END) AS BIGINT) AS g1",
    "CAST(sum(CASE WHEN gold = 0 THEN cnt ELSE 0 END) AS BIGINT) AS g0",
    "CAST(sum(CASE WHEN gold = 1 THEN r1 * cnt ELSE 0 END) AS BIGINT) AS a1",
    "CAST(sum(CASE WHEN gold = 1 THEN r2 * cnt ELSE 0 END) AS BIGINT) AS a2",
    "CAST(sum(CASE WHEN gold = 1 THEN r3 * cnt ELSE 0 END) AS BIGINT) AS a3",
    "CAST(sum(CASE WHEN gold = 0 THEN r1 * cnt ELSE 0 END) AS BIGINT) AS d1",
    "CAST(sum(CASE WHEN gold = 0 THEN r2 * cnt ELSE 0 END) AS BIGINT) AS d2",
    "CAST(sum(CASE WHEN gold = 0 THEN r3 * cnt ELSE 0 END) AS BIGINT) AS d3",
]

_AQA_COUNTERS = "      SELECT\n        " + ",\n        ".join(_AQA_COUNTER_EXPRS)

_AQA_LANG_FINAL = """
    SELECT lang,
           CAST(sum(cnt) AS BIGINT) AS n_docs,
           CASE WHEN CAST(sum(cnt) AS DECIMAL(13,0))
                       * CAST(sum(cnt) AS DECIMAL(13,0))
                     - (CAST(sum(r1 * cnt) AS DECIMAL(13,0))
                          * CAST(sum(r2 * cnt) AS DECIMAL(13,0))
                        + CAST(sum(cnt) - sum(r1 * cnt) AS DECIMAL(13,0))
                          * CAST(sum(cnt) - sum(r2 * cnt) AS DECIMAL(13,0)))
                     = 0 THEN NULL
                ELSE CAST(CAST(sum(cnt) AS DECIMAL(13,0))
                            * CAST(sum(r1 * r2 * cnt)
                                   + sum((1 - r1) * (1 - r2) * cnt)
                                   AS DECIMAL(13,0))
                          - (CAST(sum(r1 * cnt) AS DECIMAL(13,0))
                               * CAST(sum(r2 * cnt) AS DECIMAL(13,0))
                             + CAST(sum(cnt) - sum(r1 * cnt) AS DECIMAL(13,0))
                               * CAST(sum(cnt) - sum(r2 * cnt)
                                      AS DECIMAL(13,0))) AS DOUBLE)
                     / CAST(CAST(sum(cnt) AS DECIMAL(13,0))
                              * CAST(sum(cnt) AS DECIMAL(13,0))
                            - (CAST(sum(r1 * cnt) AS DECIMAL(13,0))
                                 * CAST(sum(r2 * cnt) AS DECIMAL(13,0))
                               + CAST(sum(cnt) - sum(r1 * cnt)
                                      AS DECIMAL(13,0))
                                 * CAST(sum(cnt) - sum(r2 * cnt)
                                        AS DECIMAL(13,0))) AS DOUBLE)
                END AS kappa_r1r2,
           CAST(sum(CASE WHEN ds_label <> majority THEN cnt ELSE 0 END)
                AS BIGINT) AS n_flips,
           CAST(sum(CASE WHEN gold IS NOT NULL THEN cnt ELSE 0 END)
                AS BIGINT) AS gold_n,
           CAST(sum(CASE WHEN gold IS NOT NULL AND majority = gold
                         THEN cnt ELSE 0 END) AS BIGINT) AS maj_correct,
           CAST(sum(CASE WHEN gold IS NOT NULL AND ds_label = gold
                         THEN cnt ELSE 0 END) AS BIGINT) AS ds_correct,
           CAST(sum(CASE WHEN gold IS NOT NULL AND ds_label = gold
                         THEN cnt ELSE 0 END) AS BIGINT)
             - CAST(sum(CASE WHEN gold IS NOT NULL AND majority = gold
                             THEN cnt ELSE 0 END) AS BIGINT) AS ds_net_gain
"""


@query(
    "annotation_qa_pipeline",
    oracle=f"""
    WITH cells AS MATERIALIZED (
      {_AQA_CELLS}
    ),
    c AS (
      {_AQA_COUNTERS}
      FROM cells
    ),
    pat AS (
      SELECT r1, r2, r3 FROM cells GROUP BY 1, 2, 3
    ),
    patds AS MATERIALIZED (
      SELECT p.r1, p.r2, p.r3,
             CAST(p.r1 + p.r2 + p.r3 >= 2 AS INT) AS majority,
             CASE WHEN s1 > s0 THEN 1 WHEN s1 < s0 THEN 0
                  ELSE CAST(p.r1 + p.r2 + p.r3 >= 2 AS INT)
                  END AS ds_label
      FROM (
        SELECT p.r1, p.r2, p.r3,
        {_DS_SCORES}
        FROM pat p CROSS JOIN c
      ) p
    )
    {_AQA_LANG_FINAL}
    FROM cells JOIN patds USING (r1, r2, r3)
    GROUP BY lang
    """,
)
def q_annotation_qa_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annotation-QA flagship: the report a labeling operation runs
    before accepting a batch — per-language inter-annotator agreement
    (Cohen's kappa between the accurate rater and a lenient one: LOW
    kappa is the signal that triggers relabeling), gold-seeded
    Dawid-Skene reassignment, and the gold-holdout audit proving DS
    beats majority vote (ds_net_gain > 0: DS recovers the ~16% of gold
    negatives both lenient raters over-approved, at the cost of the
    ~6% of gold positives the accurate rater flipped — measured and
    pinned in pytest).

    CELL COLLAPSE, the profile-collapse move one level up: ONE scan
    rolls documents into <= |langs|x2^3x3 (lang, pattern, gold) cells,
    and every downstream stage — global confusion counters, pattern
    posteriors, per-lang kappa marginals, flip counts, holdout
    accuracies — is arithmetic over that <= 120-row table. At 100 TB
    the pipeline is ONE map-side-combined exchange; nothing else
    scales with the corpus. The DuckDB twin MATERIALIZES the cells and
    pattern CTEs (3 consumers — the inlined-CTE re-execution trap);
    the Spark side reuses the one cells DataFrame, whose lineage is a
    single aggregate. Kappa follows the DECIMAL(27,0) exact-product
    rule; DS scores the fixed-double-tree rule (both documented in
    eval_cohen_kappa / eval_dawid_skene_gold). Reference: Dawid & Skene
    1979; Cohen 1960; composition surface per SURVEY.md §2.2
    (flagship pipelines, the corpus_curation_pipeline pattern).
    """
    cells = (
        load_table(spark, sf_dir, "documents")
        .selectExpr(
            "lang",
            f"{_DS_R1} AS r1",
            f"{_DS_R2} AS r2",
            f"{_DS_R3} AS r3",
            f"{_DS_GOLD} AS gold",
        )
        .groupBy("lang", "r1", "r2", "r3", "gold")
        .agg(F.expr("CAST(count(*) AS BIGINT) AS cnt"))
    )
    c = cells.agg(*[F.expr(e) for e in _AQA_COUNTER_EXPRS])
    pat = cells.select("r1", "r2", "r3").distinct()
    s1_expr, s0_expr = _DS_SCORES.split("AS s1,")
    patds = (
        pat.crossJoin(F.broadcast(c))
        .selectExpr(
            "r1", "r2", "r3",
            s1_expr.strip() + " AS s1",
            s0_expr.strip(),
        )
        .selectExpr(
            "r1", "r2", "r3",
            "CAST(r1 + r2 + r3 >= 2 AS INT) AS majority",
            "CASE WHEN s1 > s0 THEN 1 WHEN s1 < s0 THEN 0"
            "     ELSE CAST(r1 + r2 + r3 >= 2 AS INT) END AS ds_label",
        )
    )
    joined = cells.join(F.broadcast(patds), ["r1", "r2", "r3"])
    return joined.groupBy("lang").agg(
        F.expr("CAST(sum(cnt) AS BIGINT) AS n_docs"),
        F.expr(
            "CASE WHEN CAST(sum(cnt) AS DECIMAL(13,0))"
            "            * CAST(sum(cnt) AS DECIMAL(13,0))"
            "          - (CAST(sum(r1 * cnt) AS DECIMAL(13,0))"
            "               * CAST(sum(r2 * cnt) AS DECIMAL(13,0))"
            "             + CAST(sum(cnt) - sum(r1 * cnt) AS DECIMAL(13,0))"
            "               * CAST(sum(cnt) - sum(r2 * cnt) AS DECIMAL(13,0)))"
            "          = 0 THEN NULL"
            "     ELSE CAST(CAST(sum(cnt) AS DECIMAL(13,0))"
            "                 * CAST(sum(r1 * r2 * cnt)"
            "                        + sum((1 - r1) * (1 - r2) * cnt)"
            "                        AS DECIMAL(13,0))"
            "               - (CAST(sum(r1 * cnt) AS DECIMAL(13,0))"
            "                    * CAST(sum(r2 * cnt) AS DECIMAL(13,0))"
            "                  + CAST(sum(cnt) - sum(r1 * cnt)"
            "                         AS DECIMAL(13,0))"
            "                    * CAST(sum(cnt) - sum(r2 * cnt)"
            "                           AS DECIMAL(13,0))) AS DOUBLE)"
            "          / CAST(CAST(sum(cnt) AS DECIMAL(13,0))"
            "                   * CAST(sum(cnt) AS DECIMAL(13,0))"
            "                 - (CAST(sum(r1 * cnt) AS DECIMAL(13,0))"
            "                      * CAST(sum(r2 * cnt) AS DECIMAL(13,0))"
            "                    + CAST(sum(cnt) - sum(r1 * cnt)"
            "                           AS DECIMAL(13,0))"
            "                      * CAST(sum(cnt) - sum(r2 * cnt)"
            "                             AS DECIMAL(13,0))) AS DOUBLE)"
            "     END AS kappa_r1r2"
        ),
        F.expr(
            "CAST(sum(CASE WHEN ds_label <> majority THEN cnt ELSE 0 END)"
            " AS BIGINT) AS n_flips"
        ),
        F.expr(
            "CAST(sum(CASE WHEN gold IS NOT NULL THEN cnt ELSE 0 END)"
            " AS BIGINT) AS gold_n"
        ),
        F.expr(
            "CAST(sum(CASE WHEN gold IS NOT NULL AND majority = gold"
            " THEN cnt ELSE 0 END) AS BIGINT) AS maj_correct"
        ),
        F.expr(
            "CAST(sum(CASE WHEN gold IS NOT NULL AND ds_label = gold"
            " THEN cnt ELSE 0 END) AS BIGINT) AS ds_correct"
        ),
        F.expr(
            "CAST(sum(CASE WHEN gold IS NOT NULL AND ds_label = gold"
            " THEN cnt ELSE 0 END) AS BIGINT)"
            " - CAST(sum(CASE WHEN gold IS NOT NULL AND majority = gold"
            " THEN cnt ELSE 0 END) AS BIGINT) AS ds_net_gain"
        ),
    )


# ---------------------------------------------------------------------------
# Krippendorff's alpha under MISSING ratings (unequal raters per unit)

_KAM_COV3 = (
    "(instr('0123456789abcdef', substr(md5(concat("
    "'cov3:', CAST(doc_id AS STRING))), 1, 1)) <= 11)"
)


@query(
    "eval_kripp_alpha_missing",
    oracle=f"""
    WITH lab AS (
      SELECT lang,
             {_rater(1, 2)} + {_rater(2, 3)}
               + CASE WHEN {_KAM_COV3} THEN {_rater(3, 4)} ELSE 0 END AS n1,
             CASE WHEN {_KAM_COV3} THEN 3 ELSE 2 END AS m
      FROM documents
    ),
    c AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(m) AS BIGINT) AS n_ratings,
             CAST(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_missing,
             CAST(sum(n1) AS BIGINT) AS t1,
             CAST(sum(m - n1) AS BIGINT) AS t0,
             CAST(sum(CASE WHEN m = 2 THEN 2 * n1 * (m - n1)
                           ELSE n1 * (m - n1) END) AS BIGINT) AS u_sum
      FROM lab GROUP BY lang
    )
    SELECT lang, n_units, n_ratings, n_missing,
           CASE WHEN CAST(t1 AS DECIMAL(13,0)) * CAST(t0 AS DECIMAL(13,0))
                     = 0 THEN NULL
                ELSE CAST(2 * CAST(t1 AS DECIMAL(13,0))
                            * CAST(t0 AS DECIMAL(13,0))
                          - CAST(n_ratings - 1 AS DECIMAL(13,0))
                            * CAST(u_sum AS DECIMAL(13,0)) AS DOUBLE)
                     / CAST(2 * CAST(t1 AS DECIMAL(13,0))
                              * CAST(t0 AS DECIMAL(13,0)) AS DOUBLE)
                END AS alpha_missing
    FROM c
    """,
)
def q_eval_kripp_alpha_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha under MISSING ratings — the reason alpha
    exists at all (kappa needs a complete panel; real annotation
    batches never have one). Rater 3 covers only a deterministic 11/16
    md5 slice of documents, so units carry m ∈ {2, 3} ratings; alpha's
    pooled-pairs chance model handles the imbalance exactly:

      alpha = (2·T1·T0 − (n..−1)·Σᵢ uᵢ) / (2·T1·T0),
      uᵢ = 2·nᵢ1·nᵢ0/(mᵢ−1)

    where n.. counts ratings over pairable units. The per-unit term uᵢ
    is INTEGER for binary data with m ∈ {2, 3} (for m=3, nᵢ1·nᵢ0 is 0
    or 2), so the whole statistic is one DOUBLE division of
    DECIMAL(27,0)-exact integers — no float accumulators anywhere.

    Plan: one scan, three md5s + one coverage hash per row, one
    lang-keyed aggregate of six BIGINT counters — missing-data
    agreement over 100 TB of annotations costs one exchange. Pytest
    recomputes alpha over exact Fractions (including the m-aware unit
    terms) and pins real missingness (0 < n_missing < n_units per
    lang). Reference: Krippendorff 2004 §11 (nominal metric, unequal
    raters per unit); completes the agreement trio beside
    eval_cohen_kappa and eval_fleiss_kappa.
    """
    lab = load_table(spark, sf_dir, "documents").selectExpr(
        "lang",
        f"{_rater(1, 2)} + {_rater(2, 3)}"
        f" + CASE WHEN {_KAM_COV3} THEN {_rater(3, 4)} ELSE 0 END AS n1",
        f"CASE WHEN {_KAM_COV3} THEN 3 ELSE 2 END AS m",
    )
    c = lab.groupBy("lang").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_units"),
        F.expr("CAST(sum(m) AS BIGINT) AS n_ratings"),
        F.expr(
            "CAST(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_missing"
        ),
        F.expr("CAST(sum(n1) AS BIGINT) AS t1"),
        F.expr("CAST(sum(m - n1) AS BIGINT) AS t0"),
        F.expr(
            "CAST(sum(CASE WHEN m = 2 THEN 2 * n1 * (m - n1)"
            " ELSE n1 * (m - n1) END) AS BIGINT) AS u_sum"
        ),
    )
    return c.selectExpr(
        "lang",
        "n_units",
        "n_ratings",
        "n_missing",
        "CASE WHEN CAST(t1 AS DECIMAL(13,0)) * CAST(t0 AS DECIMAL(13,0))"
        "          = 0 THEN NULL"
        "     ELSE CAST(2 * CAST(t1 AS DECIMAL(13,0))"
        "                 * CAST(t0 AS DECIMAL(13,0))"
        "               - CAST(n_ratings - 1 AS DECIMAL(13,0))"
        "                 * CAST(u_sum AS DECIMAL(13,0)) AS DOUBLE)"
        "          / CAST(2 * CAST(t1 AS DECIMAL(13,0))"
        "                   * CAST(t0 AS DECIMAL(13,0)) AS DOUBLE)"
        "     END AS alpha_missing",
    )


@query(
    "eval_pass_at_k",
    oracle="""
    WITH t AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM events GROUP BY user_id
    )
    SELECT user_id, n AS n_trials, c AS n_success,
           CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS pass_at_1,
           CASE WHEN n < 5 THEN NULL
                WHEN n - c < 5 THEN CAST(1 AS DOUBLE)
                ELSE CAST(1 AS DOUBLE)
                   - CAST((CAST((n - c) AS HUGEINT) * ((n - c) - 1) * ((n - c) - 2) * ((n - c) - 3) * ((n - c) - 4)) AS DOUBLE)
                   / CAST((CAST(n AS HUGEINT) * (n - 1) * (n - 2) * (n - 3) * (n - 4)) AS DOUBLE)
           END AS pass_at_5,
           CASE WHEN n < 10 THEN NULL
                WHEN n - c < 10 THEN CAST(1 AS DOUBLE)
                ELSE CAST(1 AS DOUBLE)
                   - CAST((CAST((n - c) AS HUGEINT) * ((n - c) - 1) * ((n - c) - 2) * ((n - c) - 3) * ((n - c) - 4) * ((n - c) - 5) * ((n - c) - 6) * ((n - c) - 7) * ((n - c) - 8) * ((n - c) - 9)) AS DOUBLE)
                   / CAST((CAST(n AS HUGEINT) * (n - 1) * (n - 2) * (n - 3) * (n - 4) * (n - 5) * (n - 6) * (n - 7) * (n - 8) * (n - 9)) AS DOUBLE)
           END AS pass_at_10
    FROM t
    """,
)
def q_eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k eval aggregation — the Codex-paper unbiased estimator
    (Chen et al. 2021, eq. 1): for a task with n sampled attempts of
    which c succeed, pass@k = 1 - C(n-c, k) / C(n, k), the probability
    a random size-k subset contains a success. The standard report
    behind every code/eval benchmark sweep; tasks here are users, an
    attempt is an event, success is a purchase (45 <= n <= 99 per task
    at EVERY fixture scale — densified corpora multiply tasks, not
    per-task attempts, so the arithmetic bounds below hold at x64+).

    Exactness: the binomial RATIO is computed as the falling-factorial
    quotient prod_i (n-c-i) / prod_i (n-i) — both products exact
    integers (k=10 tops out near 99*...*90 ~ 6.3e19, so they ride
    DECIMAL(38,0)/HUGEINT per the house widening rule), then ONE
    correctly-rounded cast each and ONE division: a fixed IEEE tree,
    bit-identical cross-engine (the stats_ols_trend precedent). n < k
    emits NULL (estimator undefined); c > n - k emits exactly 1. The
    n < k tier is latent on the fixtures (min n = 45); the pytest
    reference covers it instead.

    The 100-TB view: one scan, one map-side-combined rollup to |tasks|
    counter pairs; per-task arithmetic is k-bounded (<= 10 factors).
    The DECIMAL(38,0) product ceiling is n <~ 6000 at k=10 — eval
    harnesses bound n by design (the paper samples n <= 200); a larger
    n would switch to the log-space estimator and lose the exact
    oracle. Reference: massimostanzione/distgrep is grep-only
    (worker.go:24-43); eval surface per SURVEY.md 2.2."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.groupBy("user_id").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n"),
        F.expr(
            "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS c"
        ),
    )

    def ff(base: str, k: int) -> str:
        return "(" + " * ".join(
            [f"CAST({base} AS DECIMAL(38,0))"]
            + [f"({base} - {i})" for i in range(1, k)]
        ) + ")"

    def passk(k: int) -> str:
        return (
            f"CASE WHEN n < {k} THEN NULL"
            f" WHEN n - c < {k} THEN CAST(1 AS DOUBLE)"
            f" ELSE CAST(1 AS DOUBLE)"
            f" - CAST({ff('(n - c)', k)} AS DOUBLE)"
            f" / CAST({ff('n', k)} AS DOUBLE)"
            f" END AS pass_at_{k}"
        )

    return t.selectExpr(
        "user_id",
        "n AS n_trials",
        "c AS n_success",
        "CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS pass_at_1",
        passk(5),
        passk(10),
    )
