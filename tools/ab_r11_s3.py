"""Session-3 interleaved A/Bs: old form (inline snapshot) vs the
registered new form, same process, equality-checked before timing.

Targets: agg_approx_distinct_error (Expand removal via distinct-pair
rollup), scalar_map_fns (2 exchanges -> 1), text_ngram_novelty_decay
(fan-out checkpoint), dedup_clusters_cc (posting rollup vs self-join).

Usage: python tools/ab_r11_s3.py [name ...]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def old_agg_approx_distinct_error(spark, sf_dir):
    from distgrep_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    both = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", 0.01).alias("_approx"),
    )
    return both.select(
        "event_type",
        "n_users",
        (
            F.abs(F.col("_approx") - F.col("n_users"))
            <= F.lit(0.05) * F.col("n_users")
        ).alias("err_ok"),
    )


def old_scalar_map_fns(spark, sf_dir):
    from distgrep_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    per_line = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.max("l_quantity").alias("q")
    )
    m = F.map_from_entries(
        F.sort_array(F.collect_list(F.struct("l_linenumber", "q")))
    )
    return (
        per_line.groupBy("l_orderkey")
        .agg(m.alias("m"))
        .select(
            "l_orderkey",
            F.element_at("m", F.lit(1)).alias("qty_line1"),
            F.size("m").alias("n_lines"),
            F.array_max(F.map_keys("m")).alias("max_lineno"),
        )
    )


def old_text_ngram_novelty_decay(spark, sf_dir):
    from distgrep_spark.functions.textfns import ngrams_of_tokens
    from distgrep_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.selectExpr("doc_id", "source", r"split(trim(text), '\\s+') AS t")
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(ngrams_of_tokens(F.col("t"), 3)).alias("gram"),
    ).distinct()
    firsts = grams.groupBy("gram").agg(
        F.expr("min_by(source, doc_id) AS first_source")
    )
    intro = firsts.groupBy(F.col("first_source").alias("source")).agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_introduced")
    )
    per_source = grams.groupBy("source").agg(
        F.expr("CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs"),
        F.expr("CAST(count(*) AS BIGINT) AS n_doc_grams"),
        F.expr("CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct_grams"),
    )
    return (
        per_source.alias("p")
        .join(intro.alias("i"), "source", "left")
        .selectExpr(
            "source",
            "n_docs",
            "n_doc_grams",
            "n_distinct_grams",
            "CAST(coalesce(n_introduced, 0) AS BIGINT) AS n_introduced",
            "CAST(coalesce(n_introduced, 0) AS DOUBLE)"
            " / CAST(n_distinct_grams AS DOUBLE) AS introduction_share",
        )
    )


def old_dedup_clusters_cc(spark, sf_dir):
    from distgrep_spark.operators.graph import dedup_clusters
    from distgrep_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select("doc_id", F.md5("text").alias("h"))
    pairs = (
        hashed.alias("a")
        .join(
            hashed.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    return dedup_clusters(docs, pairs)


OLD = {
    "agg_approx_distinct_error": old_agg_approx_distinct_error,
    "scalar_map_fns": old_scalar_map_fns,
    "text_ngram_novelty_decay": old_text_ngram_novelty_decay,
    "dedup_clusters_cc": old_dedup_clusters_cc,
}


def main() -> None:
    from distgrep_spark import queries as q
    from distgrep_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_AB_REPS", "5")))
    spark = get_spark("ab-r11-s3")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy().count().write.format(
        "noop"
    ).mode("overwrite").save()

    names = sys.argv[1:] or list(OLD)

    def run(df):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    for name in names:
        new_df = q.QUERIES[name](spark, sf_dir)
        old_df = OLD[name](spark, sf_dir)
        a = sorted(map(tuple, old_df.collect()))
        b = sorted(map(tuple, new_df.collect()))
        eq = a == b
        print(f"{name}: rows_old={len(a)} rows_new={len(b)} equal={eq}", flush=True)
        if not eq:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
            print(f"  FIRST DIFFS: {diffs}", flush=True)
            continue
        olds, news = [], []
        for _ in range(reps):
            o_df = OLD[name](spark, sf_dir)
            olds.append(run(o_df))
            n_df = q.QUERIES[name](spark, sf_dir)
            news.append(run(n_df))
            gc.collect()
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        print(
            f"{name}: old med={med(olds):.3f} {['%.2f' % x for x in olds]}"
            f" | new med={med(news):.3f} {['%.2f' % x for x in news]}",
            flush=True,
        )
        gc.collect()

    spark.stop()


if __name__ == "__main__":
    main()
