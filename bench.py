"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query is executed
$SPARK_GRAFT_BENCH_REPS times (default 3) through the ``noop`` sink
(full execution of every operator, no driver-side row transfer — the
standard Spark bench discipline; collect() would bill py4j
serialization of the result set to the engine). Per query the reported
time is the MEDIAN of the reps (round-5 de-noise: host variance was
measured at ±70% on single runs, which made round-over-round per-query
deltas unattributable; the median sheds the codegen-JIT first-run cost
and scheduler noise) and BENCH_FULL.json carries the per-query
max-min spread so regression triage can cite signal. The metric is the
sum of per-query medians across the suite.
"""

from __future__ import annotations

import json
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship grep + one representative per operator
# family, including the LLM north stars (dedup/similarity/text/stream)
# so the driver-visible stdout map shows every family's cost point.
HEADLINE = [
    "grep_contains",
    "agg_pricing_summary",
    "join_broadcast_dim",
    "join_multiway",
    "topk_customers",
    "window_rank_orders",
    "json_extract_events",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "text_stats",
    "stream_tumbling_counts",
    "stream_dedup_within_watermark",
    "corpus_curation_pipeline",
    "agg_countmin_gate",
    "embed_pca_power_step",
    "events_behavior_pipeline",
    "stats_ols_trend",
    # round 7: the RLHF-curation flagship, the preference kernel, and
    # the to-convergence iterative kernel — the three new scored rows
    "rlhf_preference_curation",
    "orders_bradley_terry_step",
    "graph_pagerank_converged",
    # round 9 continuation: the annotation/eval-QA flagship (cell-
    # collapsed kappa gate -> Dawid-Skene relabel -> gold audit)
    "annotation_qa_pipeline",
    # round 10: the verified-fixpoint CC kernel (pre-contraction took
    # its sf0.1 wall 6.99 -> ~2.5 s) and the tokenizer-aware budgeting
    # flagship (BPE-encode -> sqrt-temperature mixture -> md5-ranked
    # selection) — the two new scored rows
    "graph_cc_star_converged",
    "tokenizer_mixture_pipeline",
    # round 11: the learned-filter flagship (train -> infer -> filter,
    # the new scored row) and the production-depth Arrow BPE encode
    "quality_filter_pipeline",
    "text_bpe_encode_deep",
]


def main() -> None:
    from distgrep_spark import queries as q
    from distgrep_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("distgrep-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: absorb JVM/codegen startup AND Hadoop filesystem + parquet
    # reader initialization (~1-2 s one-time) so they aren't billed to q1.
    spark.range(1).collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy().count().write.format(
        "noop"
    ).mode("overwrite").save()

    # Arrow / Pandas-UDF path warm-up: the FIRST Pandas-UDF stage in a
    # session pays Python-worker spawn + pandas/pyarrow import per worker
    # slot (measured: multimodal_byte_features first rep 4.18 s vs 0.72 s
    # warm — the whole round-5 'worst per-query spread' was this one-time
    # cost landing inside the timed reps). One tiny mapInPandas over one
    # partition per core warms every slot once, unbilled.
    def _warm_arrow(batches):
        for b in batches:
            yield b

    # One row per partition, one partition per core: a fixed row count
    # (the old 64) leaves empty partitions on >64-core hosts, those
    # Python worker slots never spawn, and the import cost lands back in
    # the first timed Pandas-UDF rep (round-6 advice).
    _slots = spark.sparkContext.defaultParallelism
    spark.range(_slots, numPartitions=_slots).mapInPandas(
        _warm_arrow, "id long"
    ).write.format("noop").mode("overwrite").save()

    names = [n for n in HEADLINE if n in q.QUERIES]
    names += [n for n in sorted(q.QUERIES) if n not in names]

    # Shard mode (round-11 long-session A/B): SPARK_GRAFT_BENCH_SHARD=i/N
    # runs names[i::N] in THIS process — a fresh session per shard, so
    # summing N shards' timings measures the suite without accumulated
    # session state (codegen caches, pinned py4j refs, JIT/GC history).
    # tools/ab_bench_shards.py drives the comparison vs the monolithic
    # run; the driver contract (no env) is unchanged.
    shard = os.environ.get("SPARK_GRAFT_BENCH_SHARD")
    if shard:
        i, n_shards = (int(x) for x in shard.split("/"))
        names = names[i::n_shards]

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in names:
        runs: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.perf_counter() - t0, 3))
            except Exception as e:  # noqa: BLE001
                print(f"bench error in {name}: {e}", file=sys.stderr)
                runs = []
                break
            # Release py4j references so the ContextCleaner frees each
            # query's localCheckpoint blocks promptly: across hundreds of
            # queries in ONE session the pinned blocks otherwise
            # accumulate in storage memory (measured: the x16 prefix soak
            # died with 'Could not allocate memory to grow
            # BytesToBytesMap' at join_salted_skew, while the same query
            # ran fine in a fresh session). Costs ~ms per query.
            gc.collect()
        if runs:
            timings[name] = sorted(runs)[len(runs) // 2]
            spreads[name] = round(max(runs) - min(runs), 3)
        else:
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    errors = sorted(n for n, t in timings.items() if t < 0)
    # Drift anchor (round-11 verdict ask #1): the in-process median of
    # the tpch_q* walls. The 22 TPC-H shapes are never edited between
    # rounds, so host/VM-window speed drift moves the anchor and every
    # other query alike; cross-round comparisons should divide by it
    # (r10->r11 lost all per-query signal to a 1.54x window). Additive
    # key only — metric/value/queries/sf and the noop-sink timing
    # methodology are unchanged. None under shard mode (no tpch rows).
    tpch_walls = sorted(
        t for n, t in timings.items() if n.startswith("tpch_q") and t >= 0
    )
    anchor = tpch_walls[len(tpch_walls) // 2] if tpch_walls else None
    # The driver captures only the TAIL of stdout (~2,000 chars), so the
    # stdout JSON line must stay compact: total + headline per-query
    # timings + error names only. The full per-query map goes to stderr
    # and to BENCH_FULL.json for local inspection.
    line = {
        "metric": "total_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
        "n_queries": len(timings),
        "n_errors": len(errors),
        "reps": reps,
        "sf": float(sf) if sf else None,
        "anchor_sec": anchor,
    }
    out = json.dumps(line)
    assert len(out) < 1900, f"stdout bench line too long ({len(out)} chars)"
    # BENCH_FULL additionally carries every query's anchor-normalized
    # ratio so a PERF comparison can be drift-normalized from the
    # artifact alone (tools/bench_regression.py uses the same anchor).
    norm = (
        {n: round(t / anchor, 3) for n, t in timings.items() if t >= 0}
        if anchor
        else {}
    )
    full = dict(
        line, queries=timings, spreads=spreads, errors=errors, normalized=norm
    )
    print(json.dumps(full), file=sys.stderr)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        # shard runs must not clobber the committed BENCH_FULL.json
        out_path = os.environ.get(
            "SPARK_GRAFT_BENCH_OUT", os.path.join(here, "BENCH_FULL.json")
        )
        with open(out_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"bench: could not write BENCH_FULL.json: {e}", file=sys.stderr)
    print(out)


if __name__ == "__main__":
    main()
