"""Structured Streaming tests: the readStream pipelines must reproduce
their batch twins (which the DuckDB oracle already certifies), plus
watermark late-data and stateful-dedup semantics.

All tests drive real micro-batch execution (availableNow trigger) into a
memory sink.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

import distgrep_spark.queries as q
from distgrep_spark.sources.catalog import load_table
from distgrep_spark.streaming.pipelines import (
    grep_event_counts,
    read_event_stream,
    stateful_dedup,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Events re-written as a micros-timestamp parquet directory (the
    NANOS source fixture can't be streamed directly; production streams
    write micros anyway)."""
    d = tmp_path_factory.mktemp("events_stream")
    load_table(spark, SF, "events").coalesce(2).write.mode("overwrite").parquet(str(d / "in"))
    return str(d / "in")


def run_to_memory(stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_stream_grep_matches_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    assert stream.isStreaming
    run_to_memory(grep_event_counts(stream, "c"), "grep_counts", "complete")
    got = rows_set(spark.sql("SELECT * FROM grep_counts"))
    want = rows_set(grep_event_counts(spark.read.parquet(event_dir), "c"))
    assert got == want and got  # click + purchase


def test_stream_tumbling_matches_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    run_to_memory(tumbling_counts(stream), "tumbling", "complete")
    got = rows_set(spark.sql("SELECT * FROM tumbling"))
    want = rows_set(tumbling_counts(spark.read.parquet(event_dir)))
    assert got == want and got


def test_stream_dedup_drops_duplicates(spark, event_dir, tmp_path):
    # inject exact duplicates: two copies of the same file
    dup_dir = tmp_path / "dups"
    src = spark.read.parquet(event_dir).limit(100)
    src.write.mode("overwrite").parquet(str(dup_dir))
    src.write.mode("append").parquet(str(dup_dir))
    assert spark.read.parquet(str(dup_dir)).count() == 200
    stream = read_event_stream(spark, str(dup_dir))
    run_to_memory(stateful_dedup(stream), "dedup", "append")
    out = spark.sql("SELECT * FROM dedup")
    assert out.count() == 100
    assert out.select("event_id").distinct().count() == 100


def test_stream_dim_enrich_matches_batch(spark, event_dir):
    """Stream-static broadcast enrichment: the streaming run of
    enrich_events_with_dim must produce exactly the batch twin's rows
    (which the DuckDB oracle certifies), with no watermark and no
    streaming state — the static side is re-broadcast per micro-batch."""
    from distgrep_spark.streaming.pipelines import enrich_events_with_dim

    dim = load_table(spark, SF, "customer")
    stream = read_event_stream(spark, event_dir)
    run_to_memory(enrich_events_with_dim(stream, dim), "dim_enrich", "append")
    got = rows_set(spark.sql("SELECT * FROM dim_enrich"))
    want = rows_set(enrich_events_with_dim(spark.read.parquet(event_dir), dim))
    assert got == want and got
    # every event survives the LEFT join (enrichment never drops rows)
    assert len(got) == spark.read.parquet(event_dir).count()


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """Three files processed as separate micro-batches
    (maxFilesPerTrigger=1); the third carries an event hours older than
    the watermark → the windowed agg must drop it.

    Why three batches, not two: Spark filters late records with the
    PREVIOUS batch's watermark and evicts state with the CURRENT one
    (SPARK-40925, needed to chain stateful operators). A late row in
    batch 1 sees a late-filter watermark still at epoch — it gets
    aggregated and its stale window is immediately evicted+emitted. Only
    from batch 2 onward does the advanced watermark gate input rows."""
    d = tmp_path / "late"
    os.makedirs(d)
    schema = "event_id long, ts string, user_id long, event_type string, value double, props string"

    def mk(rows):
        return spark.createDataFrame(rows, schema).withColumn("ts", F.col("ts").cast("timestamp"))

    mk(
        [(i, f"2024-01-01 12:{10 + i}:00", 1, "click", 1.0, "{}") for i in range(5)]
    ).coalesce(1).write.parquet(str(d / "f1"))
    mk([(50, "2024-01-01 12:15:00", 1, "click", 1.0, "{}")]).coalesce(1).write.parquet(str(d / "f2"))
    mk([(99, "2024-01-01 09:00:00", 1, "click", 1.0, "{}")]).coalesce(1).write.parquet(str(d / "f3"))
    # file source orders batches by modification time: make them strictly increasing
    now = time.time()
    for sub, ts in (("f1", now - 240), ("f2", now - 120), ("f3", now)):
        for root, _, files in os.walk(d / sub):
            for f in files:
                os.utime(os.path.join(root, f), (ts, ts))

    stream = read_event_stream(spark, str(d / "*"), max_files_per_trigger=1)
    agg = tumbling_counts(stream, window="10 minutes", watermark="10 minutes")
    q = run_to_memory(agg, "late_windows", "append")
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 1
    starts = {r["window_start"].isoformat() for r in spark.sql("SELECT * FROM late_windows").collect()}
    # the 09:00 late event's window must have been dropped
    assert "2024-01-01T09:00:00" not in starts

def test_stateful_running_totals_matches_batch(spark, tmp_path):
    """applyInPandasWithState: state must carry across micro-batches —
    the stream is split into 3 files fed one per trigger, and the LAST
    update per user must equal the batch groupBy on the full input."""
    from distgrep_spark.streaming.stateful import running_user_totals

    src = load_table(spark, SF, "events")
    d = tmp_path / "in"
    src.repartition(3).write.mode("overwrite").parquet(str(d))
    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    run_to_memory(running_user_totals(stream), "running_totals", "update")
    updates = spark.sql("select * from running_totals").collect()
    assert len(updates) > 0
    # memory sink appends every update; the final state per user is the
    # last row emitted for that user (collect preserves batch order)
    final = {}
    for r in updates:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in running_user_totals(src).collect()
    }
    assert set(final) == set(batch)
    for u, (n, s) in batch.items():
        fn, fs = final[u]
        assert fn == n
        assert abs(fs - s) < 1e-6


def test_rate_source_streams(spark):
    """The rate source (SURVEY §2.2 scans row): synthetic benchmark
    stream — a real micro-batch must deliver monotonically timestamped
    rows through the same pipeline surface as the file source."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .withColumn("event_type", F.concat(F.lit("synthetic-"), F.col("value") % 3))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_rows")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("select count(*) c from rate_rows").first()["c"]
            if n >= 100:
                break
            time.sleep(1)
        assert n >= 100
        kinds = {
            r["event_type"]
            for r in spark.sql("select distinct event_type from rate_rows").collect()
        }
        assert kinds == {"synthetic-0", "synthetic-1", "synthetic-2"}
    finally:
        q.stop()


def test_stream_stream_interval_join_matches_batch(spark, event_dir, tmp_path):
    """Stream-stream join: two watermarked file streams joined on user +
    a two-sided time bound must produce exactly the batch range-join
    rows once both streams drain."""
    from distgrep_spark.streaming.pipelines import interval_join_clicks_errors

    ev = spark.read.parquet(event_dir)
    cdir, edir = tmp_path / "clicks", tmp_path / "errors"
    clicks_b = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors_b = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("err_user_id"),
        F.col("ts").alias("err_ts"),
        F.col("value").alias("err_value"),
    )
    clicks_b.write.mode("overwrite").parquet(str(cdir))
    errors_b.write.mode("overwrite").parquet(str(edir))

    clicks_s = spark.readStream.schema(
        "event_id bigint, user_id bigint, ts timestamp"
    ).parquet(str(cdir))
    errors_s = spark.readStream.schema(
        "err_user_id bigint, err_ts timestamp, err_value double"
    ).parquet(str(edir))
    run_to_memory(
        interval_join_clicks_errors(clicks_s, errors_s), "ssjoin", "append"
    )
    got = rows_set(spark.sql("select * from ssjoin"))
    want = rows_set(interval_join_clicks_errors(clicks_b, errors_b))
    assert got == want and len(want) > 0


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Kill a streaming query mid-input, restart from the same
    checkpoint: the union of outputs must cover every input exactly once
    (file source + checkpoint = replayable offsets + idempotent sink)."""
    from distgrep_spark.streaming.stateful import running_user_totals

    src = load_table(spark, SF, "events")
    d, ckpt, out = tmp_path / "in", tmp_path / "ckpt", tmp_path / "out"
    src.repartition(4).write.mode("overwrite").parquet(str(d))

    def start():
        stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
        return (
            stream.select("event_id")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    # stop after the first batch lands, mid-stream
    deadline = time.time() + 60
    while time.time() < deadline and not q.recentProgress:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)

    q2 = start()  # resume from checkpoint
    q2.awaitTermination(120)

    got = [r["event_id"] for r in spark.read.parquet(str(out)).collect()]
    want = {r["event_id"] for r in src.collect()}
    assert len(got) == len(want), "duplicated or lost rows across restart"
    assert set(got) == want


def test_foreach_batch_sink(spark, tmp_path):
    """foreachBatch: arbitrary batch-DataFrame logic as the sink —
    here, per-batch aggregation appended to parquet, a shape the
    declarative sinks can't express (multi-table writes, upserts)."""
    src = load_table(spark, SF, "events")
    d, out = tmp_path / "in", tmp_path / "fb_out"
    src.repartition(3).write.mode("overwrite").parquet(str(d))
    seen_batches = []

    def handle(batch_df, batch_id):
        seen_batches.append(batch_id)
        (
            batch_df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(str(out))
        )

    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(seen_batches) >= 2  # maxFilesPerTrigger=1 over 3 files
    total = (
        spark.read.parquet(str(out)).agg(F.sum("n").alias("s")).first()["s"]
    )
    assert total == src.count()


def test_sessionize_with_timeout(spark, tmp_path):
    """EventTimeTimeout sessionizer: a session closes when a later event
    arrives past the gap (within-state path) or when the watermark
    passes last+gap (timer path). The stream feeds file-by-file so the
    watermark actually advances between triggers."""
    from datetime import datetime

    from distgrep_spark.streaming.stateful import sessionize_with_timeout

    def ev(eid, uid, seconds):
        return (eid, datetime(2024, 1, 1, 0, 0, 0).replace(second=0)
                .fromtimestamp(1704067200 + seconds), uid, "x", 1.0, "{}")

    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    d = tmp_path / "in"
    # file 1: user 7 has a 2-event burst; user 8 one event
    spark.createDataFrame([ev(1, 7, 0), ev(2, 7, 60), ev(3, 8, 0)], schema) \
        .coalesce(1).write.mode("overwrite").parquet(str(d / "f1"))
    # file 2: 30 min later — past the 5-min gap AND far enough that the
    # 10-min watermark passes both earlier sessions' last+gap
    spark.createDataFrame([ev(4, 7, 1800), ev(5, 8, 1800)], schema) \
        .coalesce(1).write.mode("overwrite").parquet(str(d / "f2"))

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1) \
        .parquet(str(d / "*"))
    q = (
        sessionize_with_timeout(stream, watermark="10 minutes")
        .writeStream.format("memory").queryName("sessions_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], int(r["session_start"].timestamp()) - 1704067200,
         int(r["session_end"].timestamp()) - 1704067200, r["n_events"])
        for r in spark.sql("select * from sessions_t").collect()
    }
    # both users' first sessions must have closed, with exact bounds
    assert (7, 0, 60, 2) in got, got
    assert (8, 0, 0, 1) in got, got
    # the open sessions at t=1800 must NOT have been emitted
    assert not any(s[1] == 1800 for s in got), got


def test_foreach_batch_into_manifest_sink(spark, tmp_path):
    """Streaming -> custom sink integration: foreachBatch delivers each
    micro-batch to the manifest-committed jsonl writer
    (sources/jsonl_sink.py), giving the stream a per-batch atomic commit
    — the miniature of streaming into an Iceberg/Delta table. Each
    batch gets its own manifest directory; a batch that never commits
    leaves no manifest, so downstream readers see only whole batches."""
    from distgrep_spark.sources.jsonl_sink import JsonlManifestSink

    spark.dataSource.register(JsonlManifestSink)
    src = load_table(spark, SF, "events").select("event_id", "event_type")
    d, out = tmp_path / "in", tmp_path / "mf_out"
    src.repartition(3).write.mode("overwrite").parquet(str(d))

    def handle(batch_df, batch_id):
        (
            batch_df.write.format("jsonl_manifest")
            .option("path", str(out / f"batch={batch_id}"))
            .mode("append")
            .save()
        )

    stream = (
        spark.readStream.schema("event_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = stream.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination(120)

    import json as _json
    import os as _os

    total = 0
    batch_dirs = [p for p in _os.listdir(out) if p.startswith("batch=")]
    assert len(batch_dirs) >= 2
    for b in batch_dirs:
        with open(out / b / "_MANIFEST.json") as f:
            total += _json.load(f)["n_rows"]
    assert total == src.count()


def test_foreach_batch_countmin_merge_matches_batch(spark, tmp_path):
    """Sketch mergeability under incremental ingest: build a count-min
    sketch (d=4 x w=64, the agg_countmin_gate hash rows) PER MICRO-BATCH
    in foreachBatch and merge cells by addition into an accumulator —
    the merged sketch must equal the sketch built over the whole data in
    one batch pass. This is the property that lets a 100 TB pipeline
    keep per-day sketch tables and answer heavy-hitter queries without
    rescans; additivity is exactly why agg_countmin_gate may build from
    the key rollup."""
    from collections import defaultdict

    cell_of = (
        "pmod(CAST(conv(substr(md5(concat(CAST(j AS STRING), ':', "
        "CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT), 64)"
    )

    def cms_cells(df):
        return (
            df.selectExpr("user_id", "explode(array(0, 1, 2, 3)) AS j")
            .selectExpr("j", cell_of + " AS cell")
            .groupBy("j", "cell")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    d = tmp_path / "in"
    load_table(spark, SF, "events").repartition(4).write.mode("overwrite").parquet(str(d))
    merged: dict[tuple[int, int], int] = defaultdict(int)
    n_batches = []

    def handle(batch_df, batch_id):
        n_batches.append(batch_id)
        for r in cms_cells(batch_df).collect():
            merged[(r["j"], r["cell"])] += r["n"]

    stream = read_event_stream(
        spark, str(d), max_files_per_trigger=1  # force >1 micro-batch
    ).select("user_id")
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(n_batches) >= 2, "merge not exercised: only one micro-batch"
    want = {
        (r["j"], r["cell"]): r["n"]
        for r in cms_cells(spark.read.parquet(str(d))).collect()
    }
    assert dict(merged) == want


def test_persisted_hll_sketches_union_across_batches(spark, tmp_path):
    """Sketch-bytes persistence: write per-micro-batch HLL sketches (one
    binary row per batch) to parquet from foreachBatch, then union the
    STORED sketches later — the estimate must match a single-pass
    sketch over all data. This is the per-day sketch-table pattern:
    distinct-count rollups over arbitrary date ranges without ever
    rescanning the facts."""
    d, out = tmp_path / "in", tmp_path / "sketches"
    load_table(spark, SF, "events").repartition(4).write.mode("overwrite").parquet(str(d))

    def handle(batch_df, batch_id):
        (
            batch_df.agg(F.hll_sketch_agg("user_id").alias("sk"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(str(out))
        )

    stream = read_event_stream(spark, str(d), max_files_per_trigger=1).select("user_id")
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stored = spark.read.parquet(str(out))
    assert stored.count() >= 2, "union not exercised: only one sketch stored"
    merged_est = stored.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    single_est = (
        spark.read.parquet(str(d))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()[0]["est"]
    )
    exact = spark.read.parquet(str(d)).select("user_id").distinct().count()
    assert merged_est == single_est
    assert abs(merged_est - exact) <= 0.05 * exact


def test_transform_with_state_running_totals(spark, tmp_path):
    """transformWithStateInPandas — Spark 4's successor to
    applyInPandasWithState (typed per-key state handles, timers, and the
    mandatory RocksDB state store). Running totals carried across 3
    micro-batches must equal the batch groupBy, mirroring
    test_stateful_running_totals on the modern API. The PySpark side of
    this API needs the protobuf wheel (state-server wire format), which
    this container lacks — importorskip keeps the coverage honest where
    the dependency exists."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState's Python state server requires protobuf",
    )
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("tot", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            n, s = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [s]}
            )

        def close(self) -> None:
            pass

    src = load_table(spark, SF, "events")
    d = tmp_path / "in"
    src.repartition(3).write.mode("overwrite").parquet(str(d))
    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
        out = (
            stream.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=RunningTotals(),
                outputStructType="user_id bigint, n_events bigint, total_value double",
                outputMode="Update",
                timeMode="None",
            )
        )
        q = (
            out.writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        final = {}
        for r in spark.sql("SELECT * FROM tws_totals").collect():
            final[r["user_id"]] = (r["n_events"], r["total_value"])
        batch = {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in src.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.coalesce("value", F.lit(0.0))).alias("total_value"),
            )
            .collect()
        }
        assert set(final) == set(batch)
        for u, (n, s) in batch.items():
            assert final[u][0] == n and abs(final[u][1] - s) < 1e-6
    finally:
        if saved is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_foreach_batch_bitmap_distinct_merge_matches_batch(spark, tmp_path):
    """Bitmap mergeability under incremental ingest: build the per-group
    32-bit word table (operators/sketches.py bitmap_build) PER
    MICRO-BATCH and merge words by bitwise OR into an accumulator — the
    merged table must equal the one built over all data in one pass, and
    its popcount is the EXACT distinct count. OR is idempotent, so a
    replayed batch (at-least-once delivery) changes nothing — the
    property that makes per-day bitmap tables the exactly-once-free way
    to answer "distinct users this month" without rescans."""
    from distgrep_spark.operators.sketches import bitmap_build, bitmap_count

    d = tmp_path / "in"
    load_table(spark, SF, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(str(d))
    merged: dict[tuple[str, int], int] = {}
    n_batches = []

    def handle(batch_df, batch_id):
        n_batches.append(batch_id)
        for r in bitmap_build(
            batch_df, key="user_id", groups=["event_type"]
        ).collect():
            k = (r["event_type"], r["word"])
            merged[k] = merged.get(k, 0) | r["w"]

    stream = read_event_stream(
        spark, str(d), max_files_per_trigger=1
    ).select("event_type", "user_id")
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(n_batches) >= 2, "merge not exercised: only one micro-batch"
    whole = spark.read.parquet(str(d)).select("event_type", "user_id")
    want = {
        (r["event_type"], r["word"]): r["w"]
        for r in bitmap_build(
            whole, key="user_id", groups=["event_type"]
        ).collect()
    }
    assert merged == want
    # popcount of the merged words is the exact per-group distinct
    exact = {
        r["event_type"]: r["n"]
        for r in whole.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got: dict[str, int] = {}
    for (etype, _), w in merged.items():
        got[etype] = got.get(etype, 0) + bin(w & ((1 << 64) - 1)).count("1")
    assert got == exact


def test_stream_stream_left_outer_join_emits_padded_rows(spark, tmp_path):
    """LEFT OUTER stream-stream join: a click with no matching error must
    emit a NULL-padded row — but only after the watermark PROVES no
    error can still match (the outer row is withheld until eviction, so
    the test advances the watermark with a later flush file; the flush
    click itself stays buffered forever, the documented finite-stream
    gotcha)."""
    from datetime import datetime, timezone

    from distgrep_spark.streaming.pipelines import interval_join_clicks_errors

    def ts(sec):
        return datetime.fromtimestamp(1704067200 + sec, tz=timezone.utc).replace(
            tzinfo=None
        )

    cdir, edir = tmp_path / "clicks", tmp_path / "errors"
    cs = "event_id bigint, user_id bigint, ts timestamp"
    es = "err_user_id bigint, err_ts timestamp, err_value double"
    # file 1: user 7 click matched by an error 10s earlier; user 8
    # click with no error at all
    spark.createDataFrame([(1, 7, ts(600)), (2, 8, ts(600))], cs).coalesce(
        1
    ).write.mode("overwrite").parquet(str(cdir / "f1"))
    spark.createDataFrame([(7, ts(590), 1.5)], es).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(edir / "f1"))
    # file 2: flush rows far past watermark(30m) + lookback(10m), so the
    # watermark passes file 1's clicks and evicts user 8's outer row
    spark.createDataFrame([(99, 999, ts(600 + 3 * 3600))], cs).coalesce(
        1
    ).write.mode("overwrite").parquet(str(cdir / "f2"))
    spark.createDataFrame([(999, ts(600 + 3 * 3600), 0.0)], es).coalesce(
        1
    ).write.mode("overwrite").parquet(str(edir / "f2"))

    clicks_s = spark.readStream.schema(cs).option("maxFilesPerTrigger", 1).parquet(
        str(cdir / "*")
    )
    errors_s = spark.readStream.schema(es).option("maxFilesPerTrigger", 1).parquet(
        str(edir / "*")
    )
    run_to_memory(
        interval_join_clicks_errors(clicks_s, errors_s, how="left_outer"),
        "ssjoin_outer",
        "append",
    )
    got = rows_set(spark.sql("select * from ssjoin_outer"))
    assert (1, 7, ts(600), ts(590), 1.5) in got  # matched row
    assert (2, 8, ts(600), None, None) in got  # NULL-padded outer row
    # nothing beyond the batch LEFT JOIN result may appear
    assert got <= {
        (1, 7, ts(600), ts(590), 1.5),
        (2, 8, ts(600), None, None),
        (99, 999, ts(600 + 3 * 3600), ts(600 + 3 * 3600), 0.0),
    }


def test_stream_cusum_matches_batch(spark, tmp_path):
    """Streaming CUSUM state machine vs its batch twin: two
    time-ordered file batches processed through the SAME checkpoint
    (second availableNow run resumes the first run's state store), so
    the statistic folds across a real state-carry boundary; the final
    update per event type must equal the batch windows exactly —
    CUSUM is order-sensitive, which is why the batches are split by
    time and not round-robin."""
    from distgrep_spark.streaming.stateful import cusum_alerts

    src = load_table(spark, SF, "events")
    tmin, tmax = src.agg(F.min("ts"), F.max("ts")).first()
    cutoff = tmin + (tmax - tmin) / 2
    early = src.where(F.col("ts") <= F.lit(cutoff))
    late = src.where(F.col("ts") > F.lit(cutoff))
    # the parity check below reads run 2's updates, which only cover
    # keys present in the late half — require full coverage up front
    assert late.select("event_type").distinct().count() == 5
    assert early.count() > 0

    d = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    early.coalesce(1).write.mode("append").parquet(d)

    # the memory sink cannot resume from a checkpoint; foreachBatch can,
    # and this test NEEDS the resume (run 2 must reload run 1's state)
    updates: list = []

    def drain():
        q = (
            cusum_alerts(read_event_stream(spark, d))
            .writeStream.foreachBatch(
                lambda bdf, bid: updates.append(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    n_run1 = len(updates)
    late.coalesce(1).write.mode("append").parquet(d)
    drain()
    assert len(updates) > n_run1, "run 2 produced no update batch"

    final = {}
    for batch_rows in updates[n_run1:]:
        for r in batch_rows:
            final[r["event_type"]] = (
                r["n_seen"], r["cusum_now"], r["max_cusum"], r["breach"]
            )
    batch = {
        r["event_type"]: (r["n_seen"], r["cusum_now"], r["max_cusum"], r["breach"])
        for r in cusum_alerts(src).collect()
    }
    assert set(final) == set(batch)
    assert final == batch


def test_stream_topk_merge_resumes_checkpoint(spark, tmp_path):
    """Windowed top-k via the foreachBatch-merge shape: tumbling counts
    stream in update mode across TWO availableNow runs sharing one
    checkpoint (run 2 resumes run 1's state store); each micro-batch's
    updated (window, type) counts upsert into a keyed store
    (last-update-wins — streaming update mode emits cumulative counts),
    and windowed_topk over the merged store must equal the batch twin
    exactly. Splitting by time (not round-robin) makes the resume
    real: run 2 must reload run 1's window state to emit correct
    cumulative counts for windows spanning the cut."""
    from distgrep_spark.streaming.pipelines import tumbling_counts, windowed_topk

    src = load_table(spark, SF, "events")
    tmin, tmax = src.agg(F.min("ts"), F.max("ts")).first()
    cutoff = tmin + (tmax - tmin) / 2
    early = src.where(F.col("ts") <= F.lit(cutoff))
    late = src.where(F.col("ts") > F.lit(cutoff))
    assert early.count() > 0 and late.count() > 0

    d = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    early.coalesce(1).write.mode("append").parquet(d)

    store: dict = {}

    def handle(bdf, _bid):
        for r in bdf.collect():
            store[(r["window_start"], r["event_type"])] = r["n"]

    def drain():
        q = (
            tumbling_counts(read_event_stream(spark, d))
            .writeStream.foreachBatch(handle)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    n_after_run1 = len(store)
    assert n_after_run1 > 0
    late.coalesce(1).write.mode("append").parquet(d)
    drain()

    merged = spark.createDataFrame(
        [(w, t, int(n)) for (w, t), n in store.items()],
        "window_start timestamp_ntz, event_type string, n long",
    )
    got = {
        (r["window_start"], r["event_type"], r["n"], r["rank"])
        for r in windowed_topk(merged, k=3).collect()
    }
    want = {
        (r["window_start"], r["event_type"], r["n"], r["rank"])
        for r in q.QUERIES["stream_topk_windows"](spark, SF).collect()
    }
    assert got == want


def _throttle_events(spark):
    """Synthetic corpus with same-key gaps straddling the 2 h TTL:
    key (7,'x'): 0 min (emit), 60 (suppress), 130 (suppress: 70 min
    from the previous RAW event — distinguishes raw- from emitted-
    anchoring), 260 (emit: 130 min gap); key (8,'y'): 0 (emit),
    121 (emit)."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, uid, etype, minutes):
        return (eid, uid, etype, base + timedelta(minutes=minutes))

    schema = "event_id bigint, user_id bigint, event_type string, ts timestamp"
    rows = [
        ev(1, 7, "x", 0), ev(2, 8, "y", 0),
        ev(3, 7, "x", 60), ev(4, 8, "y", 121),
        ev(5, 7, "x", 130), ev(6, 7, "x", 260),
    ]
    return spark.createDataFrame(rows, schema), schema


def test_throttle_dedup_stream_matches_batch(spark, tmp_path):
    """The TTL-suppression dedup's streaming state machine must emit
    exactly the batch lag-window twin's rows (the oracle-checked form),
    across micro-batch boundaries that split a suppression chain."""
    from distgrep_spark.streaming.stateful import throttle_dedup

    df, schema = _throttle_events(spark)
    d = tmp_path / "in"
    # three files -> three triggers; the (7,'x') chain spans all three
    for i, ids in enumerate([(1, 2), (3, 4), (5, 6)]):
        df.where(df.event_id.isin(*ids)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"f{i}"))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d / "*"))
    q = (
        throttle_dedup(stream)
        .writeStream.format("memory").queryName("throttle_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"] for r in spark.sql("select * from throttle_t").collect()
    }
    want = {r["event_id"] for r in throttle_dedup(df).collect()}
    assert want == {1, 2, 4, 6}  # the designed emissions
    assert got == want


def test_throttle_dedup_out_of_order_across_batches(spark, tmp_path):
    """Pin the cross-batch ordering contract (round-6 advice): the
    streaming machine decides at ARRIVAL against max-seen per-key
    state, so a late-but-within-watermark event delivered AFTER a
    later-timestamped same-key event in a prior batch is suppressed —
    the alert-throttle semantics (a sent notification can't be
    retracted) — while the batch lag-window twin, which sorts by event
    time, emits the EARLIER event and suppresses the later one. Both
    keep the one-emission-per-quiet-period invariant; the emitted
    representative differs, deliberately."""
    from datetime import datetime, timedelta

    from distgrep_spark.streaming.stateful import throttle_dedup

    base = datetime(2024, 1, 1, 0, 0, 0)
    schema = "event_id bigint, user_id bigint, event_type string, ts timestamp"
    # One key, one quiet period: t=100 min arrives in batch 1, t=30 min
    # arrives late in batch 2 (watermark widened to 3 h so it is NOT
    # dropped as late — the interesting case is in-watermark disorder).
    early = spark.createDataFrame(
        [(12, 7, "x", base + timedelta(minutes=30))], schema
    )
    late_first = spark.createDataFrame(
        [(11, 7, "x", base + timedelta(minutes=100))], schema
    )
    d = tmp_path / "in"
    late_first.coalesce(1).write.parquet(str(d / "f0"))
    early.coalesce(1).write.parquet(str(d / "f1"))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d / "*"))
    q = (
        throttle_dedup(stream, watermark="3 hours")
        .writeStream.format("memory").queryName("throttle_ooo")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]
        for r in spark.sql("select * from throttle_ooo").collect()
    }
    batch = {
        r["event_id"]
        for r in throttle_dedup(late_first.union(early)).collect()
    }
    assert got == {11}, "stream emits the first ARRIVAL, suppresses the late one"
    assert batch == {12}, "batch twin emits the first EVENT-TIME row"
    assert len(got) == len(batch) == 1  # the shared invariant


def test_throttle_dedup_checkpoint_resume(spark, tmp_path):
    """Kill the throttle-dedup stream mid-input, restart from the same
    checkpoint: the resumed run must restore per-key last-seen state
    (suppressions that depend on batch-1 events still happen) and the
    union of outputs must equal the batch twin exactly once."""
    from distgrep_spark.streaming.stateful import throttle_dedup

    df, schema = _throttle_events(spark)
    d, ckpt, out = tmp_path / "in", tmp_path / "ckpt", tmp_path / "out"
    for i, ids in enumerate([(1, 2), (3, 4), (5, 6)]):
        df.where(df.event_id.isin(*ids)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"f{i}"))

    def start():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(d / "*"))
        return (
            throttle_dedup(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and not q.recentProgress:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)

    q2 = start()
    q2.awaitTermination(120)

    got = [r["event_id"] for r in spark.read.parquet(str(out)).collect()]
    want = {r["event_id"] for r in throttle_dedup(df).collect()}
    assert len(got) == len(want), "duplicated or lost rows across restart"
    assert set(got) == want


def test_rocksdb_is_default_state_store(spark):
    """Round-6 ask #4's 'RocksDB by default' must be real session
    config, not prose — and stay overridable for A/Bs."""
    assert "RocksDBStateStoreProvider" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    )


def test_throttle_dedup_eventtime_out_of_order_equals_batch(spark, tmp_path):
    """The watermark-buffered variant (round-7 verdict ask #2) must be a
    pure function of the event set: the SAME cross-batch disorder that
    makes the arrival-order machine diverge from the batch twin (pinned
    above) yields EQUALITY here — the stream emits the first EVENT-TIME
    row, exactly like the lag-window twin."""
    from datetime import datetime, timedelta

    from distgrep_spark.streaming.stateful import (
        throttle_dedup,
        throttle_dedup_eventtime,
    )

    base = datetime(2024, 1, 1, 0, 0, 0)
    schema = "event_id bigint, user_id bigint, event_type string, ts timestamp"
    late_first = spark.createDataFrame(
        [(11, 7, "x", base + timedelta(minutes=100))], schema
    )
    early = spark.createDataFrame(
        [(12, 7, "x", base + timedelta(minutes=30))], schema
    )
    # flush row: advances the final watermark past every real row so
    # buffered decisions finalize (append-mode drain contract); its own
    # ts stays above the watermark so it is never emitted.
    flush = spark.createDataFrame(
        [(99, 999, "z", base + timedelta(hours=20))], schema
    )
    d = tmp_path / "in"
    late_first.coalesce(1).write.parquet(str(d / "f0"))
    early.coalesce(1).write.parquet(str(d / "f1"))
    flush.coalesce(1).write.parquet(str(d / "f2"))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d / "*"))
    q = (
        throttle_dedup_eventtime(stream, watermark="3 hours")
        .writeStream.format("memory").queryName("throttle_evt_ooo")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]
        for r in spark.sql("select * from throttle_evt_ooo").collect()
    }
    batch = {
        r["event_id"]
        for r in throttle_dedup(late_first.union(early)).collect()
    }
    assert batch == {12}
    assert got == batch, "event-time variant must equal the batch twin"


def test_throttle_dedup_eventtime_arrival_permutations(spark, tmp_path):
    """Determinism sweep: the emitted set must be identical across
    arrival PERMUTATIONS of the same event set — including a
    suppression chain delivered entirely in reverse."""
    from datetime import datetime, timedelta

    from distgrep_spark.streaming.stateful import (
        throttle_dedup,
        throttle_dedup_eventtime,
    )

    df, schema = _throttle_events(spark)
    base = datetime(2024, 1, 1, 0, 0, 0)
    flush = spark.createDataFrame(
        [(99, 999, "z", base + timedelta(hours=20))], schema
    )
    want = {r["event_id"] for r in throttle_dedup(df).collect()}
    assert want == {1, 2, 4, 6}

    for name, splits in [
        ("fwd", [(1, 2), (3, 4), (5, 6)]),
        ("rev", [(6, 5), (4, 3), (2, 1)]),
    ]:
        d = tmp_path / f"in_{name}"
        for i, ids in enumerate(splits):
            df.where(df.event_id.isin(*ids)).coalesce(1).write.parquet(
                str(d / f"f{i}")
            )
        flush.coalesce(1).write.parquet(str(d / "f_flush"))
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(d / "*"))
        # widened watermark so reverse-order rows stay in-watermark
        q = (
            throttle_dedup_eventtime(stream, watermark="6 hours")
            .writeStream.format("memory").queryName(f"throttle_evt_{name}")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {
            r["event_id"]
            for r in spark.sql(
                f"select * from throttle_evt_{name}"
            ).collect()
        }
        assert got == want, (name, got, want)


def test_stream_bitmap_merge_is_idempotent_and_matches_batch(spark, tmp_path):
    """Mergeable-bitmap incremental distinct: per-micro-batch word
    tables merged into a store by OR must reproduce the batch twin
    EXACTLY — including after a deliberate double-delivery of batch 1
    (bit_or is idempotent, so at-least-once delivery suffices; the
    property approx sketches rely on, made exact)."""
    from distgrep_spark.operators.sketches import bitmap_build
    from distgrep_spark import queries as q

    src = load_table(spark, SF, "events")
    tmin, tmax = src.agg(F.min("ts"), F.max("ts")).first()
    cutoff = tmin + (tmax - tmin) / 2
    early = src.where(F.col("ts") <= F.lit(cutoff))
    late = src.where(F.col("ts") > F.lit(cutoff))
    assert early.count() > 0 and late.count() > 0

    d = str(tmp_path / "in")
    early.coalesce(1).write.mode("append").parquet(d)

    store: dict = {}

    def handle(bdf, _bid):
        words = bitmap_build(
            bdf.select("event_type", "user_id"),
            key="user_id",
            groups=["event_type"],
        )
        for r in words.collect():
            k = (r["event_type"], r["word"])
            store[k] = store.get(k, 0) | r["w"]

    def drain(ckpt):
        q_ = (
            read_event_stream(spark, d)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination(120)

    drain("ckpt1")
    snapshot = dict(store)
    drain("ckpt1b")  # re-deliver batch 1 in full: merge must be a no-op
    assert store == snapshot, "bit_or merge is not idempotent"

    late.coalesce(1).write.mode("append").parquet(d)
    drain("ckpt2")

    merged = {}
    for (etype, _word), w in store.items():
        n_words, n_users = merged.get(etype, (0, 0))
        merged[etype] = (n_words + 1, n_users + bin(w).count("1"))
    batch = {
        r["event_type"]: (r["n_words"], r["n_users"])
        for r in q.QUERIES["stream_distinct_bitmap_merge"](spark, SF).collect()
    }
    assert merged == batch
