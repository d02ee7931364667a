"""Round-12 interleaved A/Bs: pre-round-12 form (inline snapshot) vs the
registered new form (and optional ALT variants), same process,
equality-checked before timing.

Unlike ab_r11_s3.py this times BUILD + EXEC per rep (a fresh build each
rep, exactly bench.py's timed region): the round-12 changes move work
between lazy-checkpoint materialization (paid inside the first exec)
and plan re-execution, and several targets (rlhf) run driver collects
during build — timing only the noop save of a pre-built df would hide
the difference.

Usage: python tools/ab_r12.py [name ...]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def old_dedup_simhash_radius_report(spark, sf_dir):
    """Pre-r12 form: grams + blocks checkpoints, block self-join cand,
    two sigs joins, two pm joins, within/d0/uni report tail."""
    from distgrep_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("abold_shr_docs_v")
    spark.sql(
        r"""
        WITH toks AS (
          SELECT doc_id, split(trim(text), '\\s+') AS t FROM abold_shr_docs_v
        ),
        grams AS (
          SELECT DISTINCT doc_id,
                 concat_ws(' ', t[i], t[i+1], t[i+2]) AS gram
          FROM toks
          LATERAL VIEW explode(
            CASE WHEN size(t) >= 3 THEN sequence(0, size(t) - 3)
                 ELSE array() END) AS i
        )
        SELECT * FROM grams
        """
    ).localCheckpoint(eager=False).createOrReplaceTempView("abold_shr_grams_v")
    spark.sql(
        """
        WITH prof AS (
          SELECT doc_id,
                 md5(concat_ws(char(31), sort_array(collect_set(gram))))
                   AS pid
          FROM abold_shr_grams_v GROUP BY doc_id
        ),
        pg AS (
          SELECT DISTINCT p.pid, g.gram, md5(g.gram) AS h
          FROM abold_shr_grams_v g JOIN prof p USING (doc_id)
        ),
        pn AS (
          SELECT pid, CAST(count(*) AS BIGINT) AS n FROM pg GROUP BY pid
        ),
        pc AS (
          SELECT pid, p,
                 CAST(sum((v DIV 8) % 2) AS BIGINT) AS c0,
                 CAST(sum((v DIV 4) % 2) AS BIGINT) AS c1,
                 CAST(sum((v DIV 2) % 2) AS BIGINT) AS c2,
                 CAST(sum(v % 2) AS BIGINT) AS c3
          FROM (
            SELECT pid, p,
                   locate(substr(h, 1 + CAST(p AS INT), 1),
                          '0123456789abcdef') - 1 AS v
            FROM pg LATERAL VIEW explode(sequence(0, 15)) AS p
          ) GROUP BY pid, p
        )
        SELECT pc.pid, CAST(p DIV 4 AS INT) AS k,
               CAST(sum(
                 shiftleft(CASE WHEN 2 * c0 >= n THEN 1 ELSE 0 END,
                           CAST(4 * (p % 4) AS INT))
                 + shiftleft(CASE WHEN 2 * c1 >= n THEN 1 ELSE 0 END,
                             CAST(4 * (p % 4) + 1 AS INT))
                 + shiftleft(CASE WHEN 2 * c2 >= n THEN 1 ELSE 0 END,
                             CAST(4 * (p % 4) + 2 AS INT))
                 + shiftleft(CASE WHEN 2 * c3 >= n THEN 1 ELSE 0 END,
                             CAST(4 * (p % 4) + 3 AS INT))
               ) AS BIGINT) AS val
        FROM pc JOIN pn ON pc.pid = pn.pid
        GROUP BY pc.pid, p DIV 4
        """
    ).localCheckpoint(eager=False).createOrReplaceTempView(
        "abold_shr_blocks_v"
    )
    return spark.sql(
        """
        WITH blocks AS (SELECT * FROM abold_shr_blocks_v),
        pm AS (
          SELECT pid, CAST(count(*) AS BIGINT) AS m
          FROM (SELECT doc_id,
                       md5(concat_ws(char(31), sort_array(collect_set(gram))))
                         AS pid
                FROM abold_shr_grams_v GROUP BY doc_id)
          GROUP BY pid
        ),
        sigs AS (
          SELECT pid,
                 CAST(sum(CASE WHEN k = 0 THEN val ELSE 0 END) AS BIGINT) AS b0,
                 CAST(sum(CASE WHEN k = 1 THEN val ELSE 0 END) AS BIGINT) AS b1,
                 CAST(sum(CASE WHEN k = 2 THEN val ELSE 0 END) AS BIGINT) AS b2,
                 CAST(sum(CASE WHEN k = 3 THEN val ELSE 0 END) AS BIGINT) AS b3
          FROM blocks GROUP BY pid
        ),
        cand AS (
          SELECT DISTINCT a.pid AS pa, b.pid AS pb
          FROM blocks a JOIN blocks b
            ON a.k = b.k AND a.val = b.val AND a.pid < b.pid
        ),
        ham AS (
          SELECT c.pa, c.pb,
                 bit_count(sa.b0 ^ sb.b0) + bit_count(sa.b1 ^ sb.b1)
                 + bit_count(sa.b2 ^ sb.b2) + bit_count(sa.b3 ^ sb.b3) AS d
          FROM cand c
          JOIN sigs sa ON c.pa = sa.pid
          JOIN sigs sb ON c.pb = sb.pid
        ),
        within AS (
          SELECT d, CAST(sum(ma.m * mb.m) AS BIGINT) AS n_pairs,
                 CAST(count(*) AS BIGINT) AS n_profile_pairs
          FROM ham JOIN pm ma ON pa = ma.pid JOIN pm mb ON pb = mb.pid
          WHERE d <= 2
          GROUP BY d
        ),
        d0 AS (
          SELECT CAST(0 AS BIGINT) AS d,
                 CAST(coalesce(sum(m * (m - 1) DIV 2), 0) AS BIGINT)
                   AS n_pairs,
                 CAST(sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_profile_pairs
          FROM pm
        ),
        spine AS (SELECT explode(sequence(0, 2)) AS d),
        uni AS (
          SELECT d, CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
                 CAST(sum(n_profile_pairs) AS BIGINT) AS n_profile_pairs
          FROM (SELECT * FROM d0
                UNION ALL
                SELECT CAST(d AS BIGINT), n_pairs, n_profile_pairs
                FROM within)
          GROUP BY d
        )
        SELECT CAST(s.d AS BIGINT) AS hamming,
               coalesce(u.n_pairs, 0L) AS n_pairs,
               coalesce(u.n_profile_pairs, 0L) AS n_profile_pairs
        FROM spine s LEFT JOIN uni u ON s.d = u.d
        """
    )


def _rlhf_with_dsir(spark, sf_dir, variant):
    """rlhf_preference_curation with a parameterized DSIR internals
    block. variant: 'old' = no cg checkpoint, tot from tstat (pre-r12);
    'alt' = no cg checkpoint, tot from ded token counts (2x gram runs,
    no materialization)."""
    import json as _json

    from distgrep_spark.functions.textfns import ngrams_of_tokens, tokens
    from distgrep_spark.queries.analytics import _QUANT
    from distgrep_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    ded = docs.groupBy(F.md5("text").alias("digest")).agg(
        F.min("doc_id").alias("doc_id"),
        F.expr("min_by(lang, doc_id)").alias("lang"),
        F.expr("min_by(source, doc_id)").alias("source"),
        F.expr("min_by(text, doc_id)").alias("text"),
        F.expr("min_by(n_chars, doc_id)").alias("n_chars"),
        F.expr("CAST(count(*) AS BIGINT)").alias("n_copies"),
    ).localCheckpoint(eager=False)

    grams = ded.select(
        "doc_id", "lang", tokens(F.col("text")).alias("t")
    ).select(
        "doc_id",
        "lang",
        F.explode(ngrams_of_tokens(F.col("t"), 3)).alias("gram"),
    )
    cg = grams.groupBy("doc_id", "lang", "gram").agg(
        F.expr("CAST(count(*) AS BIGINT) AS c")
    )
    tstat = cg.groupBy("gram").agg(
        F.expr(
            "CAST(sum(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS BIGINT)"
            " AS f_t"
        ),
        F.expr("CAST(sum(c) AS BIGINT) AS f_s"),
    )
    if variant == "old":
        tot = tstat.agg(
            F.expr("CAST(sum(f_t) AS BIGINT) AS n_t"),
            F.expr("CAST(sum(f_s) AS BIGINT) AS n_s"),
        )
    else:  # alt: totals from the (checkpointed) survivor table directly
        tot = ded.select(
            "lang", tokens(F.col("text")).alias("t")
        ).agg(
            F.expr(
                "CAST(sum(CASE WHEN lang = 'en' THEN"
                " greatest(size(t) - 2, 0) ELSE 0 END) AS BIGINT) AS n_t"
            ),
            F.expr(
                "CAST(sum(greatest(size(t) - 2, 0)) AS BIGINT) AS n_s"
            ),
        )
    dscore = (
        cg.join(tstat, "gram")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(sum(c * (f_t * n_s - f_s * n_t)) AS BIGINT)"
                " AS score_num"
            )
        )
    )
    scored = (
        ded.select("doc_id", "lang", "source", "n_chars", "n_copies")
        .join(dscore, "doc_id", "left")
        .withColumn("score_num", F.expr("coalesce(score_num, 0L)"))
        .localCheckpoint(eager=False)
    )

    bq = scored.groupBy(
        "lang", F.expr("n_chars DIV 256").alias("bk"), "source"
    ).agg(F.expr("max(score_num) AS q"))
    baskets = bq.groupBy("lang", "bk").agg(
        F.expr("sort_array(collect_list(struct(source AS s, q))) AS bs")
    )
    pair = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(bs, (x, i) ->"
                    " transform(slice(bs, i + 2, size(bs)), y ->"
                    "   struct(x.s AS bi, y.s AS bj,"
                    "          x.q AS qi, y.q AS qj))))"
                )
            ).alias("m")
        )
        .where("m.qi <> m.qj")
        .groupBy("m.bi", "m.bj")
        .agg(
            F.expr("CAST(count(*) AS BIGINT) AS n_ij"),
            F.expr(
                "CAST(sum(CASE WHEN m.qi > m.qj THEN 1 ELSE 0 END)"
                " AS BIGINT) AS w_ij"
            ),
        )
        .localCheckpoint(eager=False)
    )
    dirs = pair.selectExpr(
        "bi AS b", "bj AS o", "n_ij", "w_ij AS w"
    ).unionByName(
        pair.selectExpr("bj AS b", "bi AS o", "n_ij", "n_ij - w_ij AS w")
    )
    w0 = dirs.groupBy("b").agg(
        F.expr("CAST(sum(n_ij) AS BIGINT) AS n_i"),
        F.expr("CAST(sum(w) AS BIGINT) AS wins_i"),
    ).selectExpr(
        "b", "n_i", "wins_i",
        "CAST(wins_i AS DOUBLE) / CAST(n_i AS DOUBLE) AS r0",
    )
    wi = w0.selectExpr("b AS _bi", "r0 AS _ri")
    wj = w0.selectExpr("b AS _bj", "r0 AS _rj")
    denom = (
        dirs.join(F.broadcast(wi), F.col("b") == F.col("_bi"))
        .join(F.broadcast(wj), F.col("o") == F.col("_bj"))
        .selectExpr(
            "b",
            "CAST(floor(CAST(n_ij AS DOUBLE) / (_ri + _rj) * 1048576 + 0.5)"
            " AS BIGINT) AS t",
        )
        .groupBy("b")
        .agg(F.expr("CAST(sum(t) AS BIGINT) AS den"))
        .selectExpr("b AS _bd", "den")
    )
    bt = w0.join(F.broadcast(denom), F.col("b") == F.col("_bd")).selectExpr(
        "b AS source",
        "round(CAST(wins_i AS DOUBLE) * 1048576 / CAST(den AS DOUBLE), 6)"
        " AS bt_strength",
    )

    thr = (
        scored.where("doc_id % 2 = 0")
        .selectExpr(
            "lang",
            "score_num",
            "CAST(row_number() OVER (PARTITION BY lang"
            " ORDER BY score_num, doc_id) AS BIGINT) AS r",
            "CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n",
        )
        .where("r = least(n, greatest(CAST(1 AS BIGINT), (n + 10) DIV 10))")
        .selectExpr("lang", "score_num AS cal_threshold")
    )

    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_QUANT} AS qv"
    )
    cand = (
        scored.join(emb.select("vec_id"),
                    scored.doc_id == F.col("vec_id"), "left_semi")
        .orderBy(F.desc("score_num"), "doc_id")
        .limit(20)
        .select("doc_id", "lang", "source", "n_copies", "score_num")
    )
    page = (
        emb.join(F.broadcast(cand), emb.vec_id == cand.doc_id)
        .select("doc_id", "score_num", "qv")
        .collect()
    )
    page.sort(key=lambda r: (-r["score_num"], r["doc_id"]))
    qv = {r["doc_id"]: list(r["qv"]) for r in page}
    rel = {
        r["doc_id"]: (21 - rank) * 1048576
        for rank, r in enumerate(page, start=1)
    }
    rank_of = {r["doc_id"]: rank for rank, r in enumerate(page, start=1)}

    def dot(a: int, b: int) -> int:
        return sum(x * y for x, y in zip(qv[a], qv[b]))

    picked = []
    remaining = set(rel)
    while remaining and len(picked) < 5:
        if not picked:
            d = min(remaining, key=lambda x: (-rel[x], x))
            picked.append((1, d, 0, rel[d]))
        else:
            sel = [p[1] for p in picked]
            d = min(
                remaining,
                key=lambda x: (-(rel[x] - max(dot(x, s) for s in sel)), x),
            )
            red = max(dot(d, s) for s in sel)
            picked.append((len(picked) + 1, d, red, rel[d] - red))
        remaining.discard(picked[-1][1])
    by_id = {p[1]: p for p in picked}
    pick_rows = [
        (
            d,
            rank_of[d],
            by_id[d][0] if d in by_id else None,
            by_id[d][2] if d in by_id else None,
            by_id[d][3] if d in by_id else None,
        )
        for d in rel
    ]
    pick_cols = ["doc_id", "rel_rank", "pick_order", "redundancy", "mmr_score"]
    picks = spark.range(0, 1, 1, 1).select(
        F.inline(
            F.from_json(
                F.lit(_json.dumps([dict(zip(pick_cols, r)) for r in pick_rows])),
                "array<struct<doc_id:bigint,rel_rank:bigint,"
                "pick_order:bigint,redundancy:bigint,mmr_score:bigint>>",
            )
        )
    )

    return (
        cand.join(F.broadcast(picks), "doc_id")
        .join(F.broadcast(bt), "source", "left")
        .join(F.broadcast(thr), "lang", "left")
        .selectExpr(
            "doc_id", "lang", "source", "n_copies", "score_num", "rel_rank",
            "bt_strength", "cal_threshold",
            "score_num >= cal_threshold AS covered",
            "pick_order", "redundancy", "mmr_score",
        )
    )


def old_rlhf_preference_curation(spark, sf_dir):
    return _rlhf_with_dsir(spark, sf_dir, "old")


def alt_rlhf_preference_curation(spark, sf_dir):
    return _rlhf_with_dsir(spark, sf_dir, "alt")


def sql_rlhf_preference_curation(spark, sf_dir):
    """SQL-over-views variant: every distributed stage is ONE spark.sql
    analysis pass instead of a chain of eagerly-analyzed Dataset
    transformations (the measured build cost is driver-side planning:
    cg-checkpoint call 0.90 s, scored 0.72 s, pair 0.42 s — see
    OPTIMIZATION_r12.md). Same checkpoints at the same fan-out points;
    the Python MMR greedy and picks literal are unchanged."""
    import json as _json

    from distgrep_spark.queries.analytics import _QUANT
    from distgrep_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("absql_docs_v")
    spark.sql(
        """
        SELECT md5(text) AS digest, min(doc_id) AS doc_id,
               min_by(lang, doc_id) AS lang,
               min_by(source, doc_id) AS source,
               min_by(text, doc_id) AS text,
               min_by(n_chars, doc_id) AS n_chars,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM absql_docs_v GROUP BY md5(text)
        """
    ).localCheckpoint(eager=False).createOrReplaceTempView("absql_ded_v")
    spark.sql(
        r"""
        WITH toks AS (
          SELECT doc_id, lang, split(trim(text), '\\s+') AS t
          FROM absql_ded_v
        ),
        grams AS (
          SELECT doc_id, lang, concat_ws(' ', t[i], t[i+1], t[i+2]) AS gram
          FROM toks
          LATERAL VIEW explode(
            CASE WHEN size(t) >= 3 THEN sequence(0, size(t) - 3)
                 ELSE array() END) AS i
        )
        SELECT doc_id, lang, gram, CAST(count(*) AS BIGINT) AS c
        FROM grams GROUP BY doc_id, lang, gram
        """
    ).localCheckpoint(eager=False).createOrReplaceTempView("absql_cg_v")
    spark.sql(
        """
        WITH tstat AS (
          SELECT gram,
                 CAST(sum(CASE WHEN lang = 'en' THEN c ELSE 0 END)
                      AS BIGINT) AS f_t,
                 CAST(sum(c) AS BIGINT) AS f_s
          FROM absql_cg_v GROUP BY gram
        ),
        tot AS (
          SELECT CAST(sum(CASE WHEN lang = 'en' THEN c ELSE 0 END)
                      AS BIGINT) AS n_t,
                 CAST(sum(c) AS BIGINT) AS n_s
          FROM absql_cg_v
        ),
        dscore AS (
          SELECT /*+ BROADCAST(tot) */ c.doc_id,
                 CAST(sum(c.c * (ts.f_t * tot.n_s - ts.f_s * tot.n_t))
                      AS BIGINT) AS score_num
          FROM absql_cg_v c JOIN tstat ts USING (gram) CROSS JOIN tot
          GROUP BY c.doc_id
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars, d.n_copies,
               coalesce(s.score_num, 0L) AS score_num
        FROM absql_ded_v d LEFT JOIN dscore s USING (doc_id)
        """
    ).localCheckpoint(eager=False).createOrReplaceTempView("absql_scored_v")
    spark.sql(
        """
        WITH bq AS (
          SELECT lang, n_chars DIV 256 AS bk, source, max(score_num) AS q
          FROM absql_scored_v GROUP BY lang, n_chars DIV 256, source
        ),
        baskets AS (
          SELECT lang, bk,
                 sort_array(collect_list(struct(source AS s, q))) AS bs
          FROM bq GROUP BY lang, bk
        )
        SELECT m.bi, m.bj, CAST(count(*) AS BIGINT) AS n_ij,
               CAST(sum(CASE WHEN m.qi > m.qj THEN 1 ELSE 0 END)
                    AS BIGINT) AS w_ij
        FROM baskets
        LATERAL VIEW explode(flatten(transform(bs, (x, i) ->
          transform(slice(bs, i + 2, size(bs)), y ->
            struct(x.s AS bi, y.s AS bj, x.q AS qi, y.q AS qj))))) AS m
        WHERE m.qi <> m.qj
        GROUP BY m.bi, m.bj
        """
    ).localCheckpoint(eager=False).createOrReplaceTempView("absql_pair_v")
    bt = spark.sql(
        """
        WITH dirs AS (
          SELECT bi AS b, bj AS o, n_ij, w_ij AS w FROM absql_pair_v
          UNION ALL
          SELECT bj AS b, bi AS o, n_ij, n_ij - w_ij AS w FROM absql_pair_v
        ),
        w0 AS (
          SELECT b, n_i, wins_i,
                 CAST(wins_i AS DOUBLE) / CAST(n_i AS DOUBLE) AS r0
          FROM (SELECT b, CAST(sum(n_ij) AS BIGINT) AS n_i,
                       CAST(sum(w) AS BIGINT) AS wins_i
                FROM dirs GROUP BY b)
        ),
        denom AS (
          SELECT /*+ BROADCAST(wi), BROADCAST(wj) */ d.b,
                 CAST(sum(CAST(floor(CAST(d.n_ij AS DOUBLE)
                   / (wi.r0 + wj.r0) * 1048576 + 0.5) AS BIGINT))
                   AS BIGINT) AS den
          FROM dirs d JOIN w0 wi ON d.b = wi.b JOIN w0 wj ON d.o = wj.b
          GROUP BY d.b
        )
        SELECT /*+ BROADCAST(dn) */ w0.b AS source,
               round(CAST(w0.wins_i AS DOUBLE) * 1048576
                     / CAST(dn.den AS DOUBLE), 6) AS bt_strength
        FROM w0 JOIN denom dn ON w0.b = dn.b
        """
    )
    thr = spark.sql(
        """
        SELECT lang, score_num AS cal_threshold
        FROM (
          SELECT lang, score_num,
                 CAST(row_number() OVER (PARTITION BY lang
                      ORDER BY score_num, doc_id) AS BIGINT) AS r,
                 CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
          FROM absql_scored_v WHERE doc_id % 2 = 0
        )
        WHERE r = least(n, greatest(CAST(1 AS BIGINT), (n + 10) DIV 10))
        """
    )
    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_QUANT} AS qv"
    )
    emb.createOrReplaceTempView("absql_emb_v")
    cand = spark.sql(
        """
        SELECT doc_id, lang, source, n_copies, score_num
        FROM absql_scored_v s
        LEFT SEMI JOIN absql_emb_v e ON s.doc_id = e.vec_id
        ORDER BY score_num DESC, doc_id LIMIT 20
        """
    )
    cand.createOrReplaceTempView("absql_cand_v")
    page = spark.sql(
        """
        SELECT /*+ BROADCAST(c) */ c.doc_id, c.score_num, e.qv
        FROM absql_emb_v e JOIN absql_cand_v c ON e.vec_id = c.doc_id
        """
    ).collect()
    page.sort(key=lambda r: (-r["score_num"], r["doc_id"]))
    qv = {r["doc_id"]: list(r["qv"]) for r in page}
    rel = {
        r["doc_id"]: (21 - rank) * 1048576
        for rank, r in enumerate(page, start=1)
    }
    rank_of = {r["doc_id"]: rank for rank, r in enumerate(page, start=1)}

    def dot(a: int, b: int) -> int:
        return sum(x * y for x, y in zip(qv[a], qv[b]))

    picked = []
    remaining = set(rel)
    while remaining and len(picked) < 5:
        if not picked:
            d = min(remaining, key=lambda x: (-rel[x], x))
            picked.append((1, d, 0, rel[d]))
        else:
            sel = [p[1] for p in picked]
            d = min(
                remaining,
                key=lambda x: (-(rel[x] - max(dot(x, s) for s in sel)), x),
            )
            red = max(dot(d, s) for s in sel)
            picked.append((len(picked) + 1, d, red, rel[d] - red))
        remaining.discard(picked[-1][1])
    by_id = {p[1]: p for p in picked}
    pick_rows = [
        (
            d,
            rank_of[d],
            by_id[d][0] if d in by_id else None,
            by_id[d][2] if d in by_id else None,
            by_id[d][3] if d in by_id else None,
        )
        for d in rel
    ]
    return _sql_rlhf_final(spark, bt, thr, cand, pick_rows)


def _sql_rlhf_final(spark, bt, thr, cand, pick_rows):
    import json as _json

    pick_cols = ["doc_id", "rel_rank", "pick_order", "redundancy", "mmr_score"]
    picks = spark.range(0, 1, 1, 1).select(
        F.inline(
            F.from_json(
                F.lit(_json.dumps([dict(zip(pick_cols, r)) for r in pick_rows])),
                "array<struct<doc_id:bigint,rel_rank:bigint,"
                "pick_order:bigint,redundancy:bigint,mmr_score:bigint>>",
            )
        )
    )
    return (
        cand.join(F.broadcast(picks), "doc_id")
        .join(F.broadcast(bt), "source", "left")
        .join(F.broadcast(thr), "lang", "left")
        .selectExpr(
            "doc_id", "lang", "source", "n_copies", "score_num", "rel_rank",
            "bt_strength", "cal_threshold",
            "score_num >= cal_threshold AS covered",
            "pick_order", "redundancy", "mmr_score",
        )
    )


def _old_shingles(df, n=3, text_col="text", id_col="doc_id"):
    """Pre-r12 distinct shingles: explode then a full DISTINCT exchange."""
    from distgrep_spark.functions.textfns import ngrams_of_tokens, tokens

    toks = df.select(id_col, tokens(F.col(text_col)).alias("_toks"))
    g = toks.select(
        id_col, F.explode(ngrams_of_tokens(F.col("_toks"), n)).alias("gram")
    )
    return g.distinct()


def _old_capped_jaccard(df, *, n=3, threshold=0.5, max_df=8):
    """Pre-r12 capped posting path (g.distinct() based)."""
    g = _old_shingles(df, n=n)
    rare = (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("gram")
    )
    posts = (
        g.join(rare, "gram")
        .groupBy("gram")
        .agg(F.sort_array(F.collect_set(F.col("doc_id"))).alias("ds"))
        .localCheckpoint(eager=False)
    )
    sizes = (
        posts.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    common = (
        posts.selectExpr(
            "explode(flatten(transform(ds, (x, i) ->"
            " transform(slice(ds, i + 2, size(ds)),"
            " y -> struct(x AS doc_a, y AS doc_b))))) AS p"
        )
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("c") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("c"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


def old_dq_split_leakage_neardup(spark, sf_dir):
    from distgrep_spark.queries.llm import _SPLIT_CASE
    from distgrep_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = _old_capped_jaccard(docs, n=3, threshold=0.5, max_df=8)
    sc = _SPLIT_CASE.format(c="text")
    split = docs.selectExpr("doc_id", f"{sc} AS split")
    a = split.selectExpr("doc_id AS doc_a", "split AS split_a")
    b = split.selectExpr("doc_id AS doc_b", "split AS split_b")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
    )


def old_dedup_ngram_jaccard(spark, sf_dir):
    """Pre-r12 uncapped profile-collapse (explode + groupBy gram-set)."""
    from distgrep_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents", spread=True)
    g = _old_shingles(docs, n=3)
    doc_grams = g.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("gram")).alias("gs")
    )
    prof = (
        doc_grams.groupBy("gs")
        .agg(F.sort_array(F.collect_list(F.col("doc_id"))).alias("members"))
        .selectExpr("members[0] AS pid", "gs", "members", "size(gs) AS n")
        .localCheckpoint(eager=False)
    )
    canon = (
        prof.select("pid", F.explode("gs").alias("gram"))
        .groupBy("gram")
        .agg(F.sort_array(F.collect_set("pid")).alias("ps"))
        .where(F.size("ps") >= 2)
        .selectExpr(
            "explode(flatten(transform(ps, (x, i) ->"
            " transform(slice(ps, i + 2, size(ps)),"
            " y -> struct(x AS pa, y AS pb))))) AS p"
        )
        .groupBy("p.pa", "p.pb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pa = prof.selectExpr("pid AS pa", "members AS ma", "n AS na")
    pb = prof.selectExpr("pid AS pb", "members AS mb", "n AS nb")
    cross = (
        canon.join(pa, "pa")
        .join(pb, "pb")
        .select(
            "ma",
            "mb",
            (F.col("c") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("c"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= 0.5)
        .selectExpr(
            "explode(flatten(transform(ma, x ->"
            " transform(mb, y -> struct(least(x, y) AS doc_a,"
            " greatest(x, y) AS doc_b))))) AS d",
            "jaccard",
        )
        .select("d.doc_a", "d.doc_b", "jaccard")
    )
    same = (
        prof.where(F.size("members") >= 2)
        .selectExpr(
            "explode(flatten(transform(members, (x, i) ->"
            " transform(slice(members, i + 2, size(members)),"
            " y -> struct(x AS doc_a, y AS doc_b))))) AS d",
            "CAST(1.0 AS DOUBLE) AS jaccard",
        )
        .select("d.doc_a", "d.doc_b", "jaccard")
    )
    return cross.unionByName(same)


OLD = {
    "dedup_simhash_radius_report": old_dedup_simhash_radius_report,
    "rlhf_preference_curation": old_rlhf_preference_curation,
    "dq_split_leakage_neardup": old_dq_split_leakage_neardup,
    "dedup_ngram_jaccard": old_dedup_ngram_jaccard,
}
ALT = {
    # 'alt' was the tot-from-ded variant (measured worse: med 4.173 vs
    # old 4.056 / new 3.915); now points at the SQL-over-views variant.
    "rlhf_preference_curation": sql_rlhf_preference_curation,
}


def main() -> None:
    from distgrep_spark import queries as q
    from distgrep_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_AB_REPS", "5")))
    spark = get_spark("ab-r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy().count().write.format(
        "noop"
    ).mode("overwrite").save()

    names = sys.argv[1:] or list(OLD)

    def run(fn):
        """bench.py's timed region: build + noop save."""
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        gc.collect()
        return dt

    for name in names:
        arms = {"old": OLD[name], "new": q.QUERIES[name]}
        if name in ALT:
            arms["alt"] = ALT[name]
        collected = {
            k: sorted(map(tuple, fn(spark, sf_dir).collect()))
            for k, fn in arms.items()
        }
        ref = collected["new"]
        for k, rows in collected.items():
            if rows != ref:
                diffs = [(x, y) for x, y in zip(rows, ref) if x != y][:5]
                print(f"{name}: {k} != new  FIRST DIFFS: {diffs}", flush=True)
                break
        else:
            print(
                f"{name}: all {len(arms)} arms equal ({len(ref)} rows)",
                flush=True,
            )
            gc.collect()
            walls = {k: [] for k in arms}
            for _ in range(reps):
                for k, fn in arms.items():
                    walls[k].append(run(fn))
            med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
            for k in arms:
                print(
                    f"{name}: {k} med={med(walls[k]):.3f} "
                    f"{['%.2f' % x for x in walls[k]]}",
                    flush=True,
                )
        gc.collect()

    spark.stop()


if __name__ == "__main__":
    main()
