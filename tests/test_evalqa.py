"""Independent semantic oracles for the annotation/eval QA family.

The DuckDB twins share the cleared-denominator ALGEBRA with the Spark
side, so parity alone can't catch an algebra error — these tests
recompute each metric from first principles (textbook formulas over
exact ``fractions.Fraction``) on the collected per-document labels and
compare to the engine's DOUBLE output. Also pins non-vacuity: the rater
panel actually disagrees, both outer classes of the cogroup reconcile
are populated, and the PR sweep moves monotonically with the threshold.
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

from distgrep_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def _panel(spark):
    """Collect (lang, n_chars, doc_id) and recompute raters in Python."""
    rows = (
        QUERIES["text_stats"].__globals__["load_table"](
            spark, SF, "documents"
        )
        .select("lang", "n_chars", "doc_id")
        .collect()
    )
    out = []
    for r in rows:
        truth = r.n_chars >= 300
        labels = []
        for rater, k in ((1, 2), (2, 3), (3, 4)):
            digit = hashlib.md5(
                f"iaa{rater}:{r.doc_id}".encode()
            ).hexdigest()[0]
            flip = "0123456789abcdef".index(digit) + 1 <= k
            labels.append(truth != flip)
        out.append((r.lang, truth, labels, r.doc_id, r.n_chars))
    return out


def test_cohen_kappa_matches_textbook_formula(spark):
    panel = _panel(spark)
    got = {
        r.lang: r for r in QUERIES["eval_cohen_kappa"](spark, SF).collect()
    }
    langs = {p[0] for p in panel}
    assert set(got) == langs
    for lang in langs:
        docs = [p for p in panel if p[0] == lang]
        n = len(docs)
        n11 = sum(1 for p in docs if p[2][0] and p[2][1])
        n00 = sum(1 for p in docs if not p[2][0] and not p[2][1])
        a1 = sum(1 for p in docs if p[2][0])
        b1 = sum(1 for p in docs if p[2][1])
        po = Fraction(n11 + n00, n)
        pe = Fraction(a1 * b1 + (n - a1) * (n - b1), n * n)
        kappa = (po - pe) / (1 - pe)
        row = got[lang]
        assert row.n_docs == n and row.n_agree == n11 + n00
        assert abs(row.po - float(po)) < 1e-12
        assert abs(row.pe - float(pe)) < 1e-12
        assert abs(row.kappa - float(kappa)) < 1e-12
        # non-vacuity: correlated-through-truth raters beat chance but
        # the noise keeps them short of perfect agreement
        assert 0.0 < row.kappa < 1.0


def test_fleiss_and_krippendorff_match_textbook_formulas(spark):
    panel = _panel(spark)
    got = {
        r.lang: r for r in QUERIES["eval_fleiss_kappa"](spark, SF).collect()
    }
    for lang in {p[0] for p in panel}:
        docs = [p for p in panel if p[0] == lang]
        n, r_n = len(docs), 3
        n1s = [sum(p[2]) for p in docs]
        # Fleiss 1971: P_i = (Σ_j n_ij² − R) / (R(R−1))
        p_o = Fraction(
            sum(x * x + (r_n - x) * (r_n - x) for x in n1s) - n * r_n,
            n * r_n * (r_n - 1),
        )
        p1 = Fraction(sum(n1s), n * r_n)
        p_e = p1 * p1 + (1 - p1) * (1 - p1)
        fleiss = (p_o - p_e) / (1 - p_e)
        # Krippendorff nominal: alpha = 1 − D_o/D_e (pooled pairs)
        t1 = sum(n1s)
        t0 = n * r_n - t1
        d_o = Fraction(
            2 * sum(x * (r_n - x) for x in n1s), n * r_n * (r_n - 1)
        )
        d_e = Fraction(2 * t1 * t0, (n * r_n) * (n * r_n - 1))
        alpha = 1 - d_o / d_e
        row = got[lang]
        assert row.n_docs == n
        assert abs(row.p_o - float(p_o)) < 1e-12
        assert abs(row.fleiss_kappa - float(fleiss)) < 1e-12
        assert abs(row.kripp_alpha - float(alpha)) < 1e-12
        assert 0.0 < row.fleiss_kappa < 1.0


def test_mcnemar_matches_textbook_formula(spark):
    panel = _panel(spark)
    b = c = 0
    for _, truth, _, doc_id, n_chars in panel:
        digit = hashlib.md5(f"mcn:{doc_id}".encode()).hexdigest()[0]
        noise = "0123456789abcdef".index(digit) * 4
        acc_a = (n_chars >= 280) == truth
        acc_b = (n_chars + noise >= 300) == truth
        b += acc_a and not acc_b
        c += acc_b and not acc_a
    row = QUERIES["eval_mcnemar_paired"](spark, SF).collect()[0]
    assert (row.b_only_a, row.c_only_b) == (b, c)
    # non-vacuous discordance on the fixture
    assert b > 0 and c > 0
    corr = max(abs(b - c) - 1, 0)
    stat = Fraction(corr * corr, b + c)
    assert abs(row.mcnemar_stat - float(stat)) < 1e-12
    assert row.reject == (1000000 * corr * corr > 3841459 * (b + c))


def test_pr_sweep_is_monotone_and_conserves_positives(spark):
    rows = sorted(
        QUERIES["eval_pr_threshold_sweep"](spark, SF).collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == 8
    positives = {r.tp + r.fn for r in rows}
    assert len(positives) == 1  # truth count invariant to threshold
    recalls = [r.recall for r in rows]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    preds = [r.tp + r.fp for r in rows]
    assert all(a >= b for a, b in zip(preds, preds[1:]))
    # the noisy score actually misclassifies near the boundary
    assert any(r.fp > 0 for r in rows) and any(r.fn > 0 for r in rows)


def test_cogroup_reconcile_classes_and_sql_equivalence(spark):
    df = QUERIES["udf_cogroup_reconcile"](spark, SF)
    rows = df.collect()
    headerless = [r for r in rows if not r.has_header]
    lineless = [r for r in rows if r.has_header and r.n_lines == 0]
    matched = [r for r in rows if r.has_header and r.n_lines > 0]
    assert headerless and lineless and matched  # all 3 classes real
    assert len({r.orderkey for r in rows}) == len(rows)
    # engine-vs-engine: the pandas cogroup must equal the pure-SQL
    # full-outer rollup computed in the SAME Spark session
    from distgrep_spark.sources.catalog import load_table

    load_table(spark, SF, "orders").createOrReplaceTempView("_ev_o")
    load_table(spark, SF, "lineitem").createOrReplaceTempView("_ev_l")
    twin = spark.sql(
        """
        WITH l AS (
          SELECT l_orderkey,
                 CAST(count(*) AS BIGINT) AS n_lines,
                 CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
                      AS BIGINT) AS sum_qty,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                               AS BIGINT)) AS BIGINT) AS lines_cents
          FROM _ev_l
          WHERE l_shipdate < TIMESTAMP '1995-07-01 00:00:00'
          GROUP BY l_orderkey
        ),
        o AS (
          SELECT o_orderkey FROM _ev_o
          WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        )
        SELECT COALESCE(o.o_orderkey, l.l_orderkey) AS orderkey,
               CAST(COALESCE(l.n_lines, 0) AS BIGINT) AS n_lines,
               CAST(COALESCE(l.sum_qty, 0) AS BIGINT) AS sum_qty,
               CAST(COALESCE(l.lines_cents, 0) AS BIGINT) AS lines_cents,
               o.o_orderkey IS NOT NULL AS has_header
        FROM o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey
        """
    )
    got = {tuple(r) for r in rows}
    want = {tuple(r) for r in twin.collect()}
    assert got == want


def test_dawid_skene_gold_matches_textbook_and_flips_lenient_majorities(
    spark,
):
    from distgrep_spark.sources.catalog import load_table

    rows = (
        load_table(spark, SF, "documents")
        .select("doc_id", "n_chars")
        .collect()
    )
    hexd = "0123456789abcdef"

    def digit(salt, doc_id):
        return hexd.index(
            hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[0]
        ) + 1

    lab = []
    for r in rows:
        truth = r.n_chars >= 300
        r1 = truth != (digit("iaa4", r.doc_id) <= 1)
        r2 = truth or (digit("iaa5", r.doc_id) <= 6)
        r3 = truth or (digit("iaa6", r.doc_id) <= 7)
        gold = (
            1 if r.n_chars >= 450 else (0 if r.n_chars < 150 else None)
        )
        lab.append((int(r1), int(r2), int(r3), gold))
    g1 = sum(1 for x in lab if x[3] == 1)
    g0 = sum(1 for x in lab if x[3] == 0)
    assert g1 > 0 and g0 > 0  # both gold anchor tails populated
    a = [sum(x[i] for x in lab if x[3] == 1) for i in range(3)]
    d = [sum(x[i] for x in lab if x[3] == 0) for i in range(3)]
    got = {
        (r.r1, r.r2, r.r3): r
        for r in QUERIES["eval_dawid_skene_gold"](spark, SF).collect()
    }
    flips = 0
    for pat, row in got.items():
        n_docs = sum(1 for x in lab if x[:3] == pat)
        assert row.n_docs == n_docs
        # exact-rational posterior: Fraction reproduces the smoothed
        # Bayes score; the engine's fixed double tree must agree to ulp
        s1 = Fraction(g1 + 1)
        s0 = Fraction(g0 + 1)
        for i in range(3):
            s1 *= (a[i] + 1) if pat[i] else (g1 - a[i] + 1)
            s0 *= (d[i] + 1) if pat[i] else (g0 - d[i] + 1)
        s1 *= (g0 + 2) ** 3
        s0 *= (g1 + 2) ** 3
        post = s1 / (s1 + s0)
        assert abs(row.posterior - float(post)) < 1e-12
        maj = int(sum(pat) >= 2)
        assert row.majority == maj
        want = 1 if s1 > s0 else (0 if s1 < s0 else maj)
        assert row.ds_label == want
        flips += row.ds_label != maj
    # the design case: every 2-vs-1 lenient-override pattern flips
    assert {p for p, r in got.items() if r.ds_label != r.majority} == {
        (0, 1, 1),
        (1, 0, 1),
        (1, 1, 0),
    }
    assert flips == 3


def test_winrate_wilson_matches_python_and_reorders_ranks(spark):
    import math

    rows = QUERIES["eval_winrate_wilson"](spark, SF).collect()
    assert len(rows) == 25
    # exposure heterogeneity is real: planted 1/16..16/16 slices
    ns = [r.n for r in rows]
    assert max(ns) > 4 * min(ns)
    for r in rows:
        p = r.wins / r.n
        lb = (
            p + 3.8416 / (2 * r.n)
            - 1.96 * math.sqrt(p * (1 - p) / r.n + 3.8416 / (4 * r.n * r.n))
        ) / (1 + 3.8416 / r.n)
        assert abs(r.p_hat - p) < 1e-15
        assert abs(r.wilson_lb - lb) < 1e-12
        assert 0.0 <= r.wilson_lb < r.p_hat  # strict shrink (n finite)
    # Wilson ranking must actually differ from raw-rate ranking
    moved = sum(1 for r in rows if r.rank_raw != r.rank_wilson)
    assert moved >= 10
    # both rank columns are permutations of 1..25
    assert sorted(r.rank_raw for r in rows) == list(range(1, 26))
    assert sorted(r.rank_wilson for r in rows) == list(range(1, 26))


def test_annotation_qa_pipeline_ds_beats_majority_on_gold(spark):
    rows = QUERIES["annotation_qa_pipeline"](spark, SF).collect()
    assert len(rows) == 5
    total_gain = sum(r.ds_net_gain for r in rows)
    total_gold = sum(r.gold_n for r in rows)
    total_flips = sum(r.n_flips for r in rows)
    assert total_gold > 0 and total_flips > 0
    # the pipeline's reason to exist: DS strictly beats majority vote
    # on the gold holdout (recovers lenient false positives)
    assert total_gain > 0
    for r in rows:
        assert 0 <= r.maj_correct <= r.gold_n
        assert 0 <= r.ds_correct <= r.gold_n
        assert r.ds_net_gain == r.ds_correct - r.maj_correct
        # lenient-vs-accurate kappa is the LOW-agreement trigger signal
        assert r.kappa_r1r2 is not None and r.kappa_r1r2 < 0.75
    # cross-query consistency: per-lang flips must sum to the global
    # pattern-level flips the standalone DS query reports
    ds = {
        (r.r1, r.r2, r.r3): r
        for r in QUERIES["eval_dawid_skene_gold"](spark, SF).collect()
    }
    want_flips = sum(
        r.n_docs for r in ds.values() if r.ds_label != r.majority
    )
    assert total_flips == want_flips


def test_kripp_alpha_missing_matches_textbook_formula(spark):
    from distgrep_spark.sources.catalog import load_table

    rows = (
        load_table(spark, SF, "documents")
        .select("lang", "doc_id", "n_chars")
        .collect()
    )
    hexd = "0123456789abcdef"

    def digit(salt, doc_id):
        return hexd.index(
            hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[0]
        ) + 1

    units = []
    for r in rows:
        truth = r.n_chars >= 300
        labels = [
            truth != (digit("iaa1", r.doc_id) <= 2),
            truth != (digit("iaa2", r.doc_id) <= 3),
        ]
        if digit("cov3", r.doc_id) <= 11:
            labels.append(truth != (digit("iaa3", r.doc_id) <= 4))
        units.append((r.lang, labels))
    got = {
        r.lang: r
        for r in QUERIES["eval_kripp_alpha_missing"](spark, SF).collect()
    }
    for lang in {u[0] for u in units}:
        mine = [u[1] for u in units if u[0] == lang]
        n_ratings = sum(len(ls) for ls in mine)
        t1 = sum(sum(ls) for ls in mine)
        t0 = n_ratings - t1
        d_o_num = sum(
            Fraction(2 * sum(ls) * (len(ls) - sum(ls)), len(ls) - 1)
            for ls in mine
        )
        d_o = d_o_num / n_ratings
        d_e = Fraction(2 * t1 * t0, n_ratings * (n_ratings - 1))
        alpha = 1 - d_o / d_e
        row = got[lang]
        assert row.n_units == len(mine)
        assert row.n_ratings == n_ratings
        missing = sum(1 for ls in mine if len(ls) == 2)
        assert row.n_missing == missing
        assert 0 < missing < len(mine)  # real, partial missingness
        assert abs(row.alpha_missing - float(alpha)) < 1e-12
        assert 0.0 < row.alpha_missing < 1.0


def test_pass_at_k_matches_comb_reference(spark):
    """eval_pass_at_k vs the Codex-paper formula: per task the engine's
    fixed cast-cast-divide tree must (a) equal the same pipeline
    replicated in Python bit-for-bit, and (b) agree with the exact
    1 - C(n-c,k)/C(n,k) rational to 1e-12 (the two differ only in
    sub-ulp rounding-path effects when the products exceed 2^53).
    Also pins the c > n - k tier live on the fixture and the n < k
    NULL tier on a synthetic row the fixture cannot produce."""
    import math

    import duckdb

    from tests.conftest import SF_ORACLE

    base = dict(
        duckdb.connect().execute(
            f"""SELECT user_id,
                  {{'n': count(*),
                   'c': sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)}}
               FROM '{SF_ORACLE}/events.parquet' GROUP BY user_id"""
        ).fetchall()
    )

    def ff(x, k):
        p = 1
        for i in range(k):
            p *= x - i
        return p

    rows = QUERIES["eval_pass_at_k"](spark, SF_ORACLE).collect()
    assert len(rows) == len(base)
    saw_clamp = False
    for r in rows:
        n, c = base[r["user_id"]]["n"], base[r["user_id"]]["c"]
        assert (r["n_trials"], r["n_success"]) == (n, c)
        assert r["pass_at_1"] == float(c) / float(n)
        for k, col in ((5, "pass_at_5"), (10, "pass_at_10")):
            if n < k:
                assert r[col] is None
            elif n - c < k:
                assert r[col] == 1.0
                saw_clamp = True
            else:
                engine_tree = 1.0 - float(ff(n - c, k)) / float(ff(n, k))
                assert r[col] == engine_tree, (r["user_id"], k)
                exact = 1 - math.comb(n - c, k) / math.comb(n, k)
                assert abs(r[col] - exact) < 1e-12
    # the estimator must DISCRIMINATE across tasks at every k
    for col in ("pass_at_1", "pass_at_5", "pass_at_10"):
        vals = {r[col] for r in rows if r[col] is not None}
        assert len(vals) > 10, f"{col} near-constant: {len(vals)} values"
    assert saw_clamp or all(
        base[r["user_id"]]["n"] - base[r["user_id"]]["c"] >= 10 for r in rows
    ), "clamp tier unobserved but inputs say it should fire"
