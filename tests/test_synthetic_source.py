"""Custom Python DataSource (sources/synthetic.py): partition planning,
determinism across partitionings, and composition with the engine."""

from __future__ import annotations

import pytest

from distgrep_spark.operators.grep import distgrep
from distgrep_spark.sources.synthetic import SyntheticDocs


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SyntheticDocs)
    return spark


def load(spark, **opts):
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_partition_planning(registered):
    df = load(registered, n_docs=100, num_partitions=6)
    assert df.rdd.getNumPartitions() == 6
    assert df.count() == 100
    assert {r["doc_id"] for r in df.collect()} == set(range(100))


def test_deterministic_across_partitionings(registered):
    a = sorted(r["text"] for r in load(registered, n_docs=200, num_partitions=3).collect())
    b = sorted(r["text"] for r in load(registered, n_docs=200, num_partitions=9).collect())
    assert a == b


def test_seed_changes_content(registered):
    a = load(registered, n_docs=50, seed=1).collect()
    b = load(registered, n_docs=50, seed=2).collect()
    assert {r["text"] for r in a} != {r["text"] for r in b}


def test_composes_with_grep(registered):
    df = load(registered, n_docs=300)
    out = distgrep(df, "spark", column="text")
    assert out.columns == ["line", "freq"]
    assert out.count() > 0


def test_stream_reader_resumes_offsets_and_matches_batch(registered, tmp_path):
    """The simpleStreamReader seam, driven through REAL checkpoint
    resumes: each availableNow run advances exactly one prefetched
    micro-batch, so repeated runs over one checkpoint must walk the
    offset watermark forward batch_docs at a time, each run resuming
    precisely where the last committed — and the union must equal the
    batch reader's rows exactly (deterministic replay == exactly-once
    for this source)."""

    def drain(max_docs):
        batches: list = []
        q = (
            registered.readStream.format("synthetic_docs")
            .option("batch_docs", 60)
            .option("max_docs", max_docs)
            .load()
            .writeStream.foreachBatch(
                lambda bdf, bid: batches.append(bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [r for b in batches for r in b]

    # one availableNow run advances one prefetched micro-batch for a
    # simple stream reader; repeated runs over the SAME checkpoint must
    # walk the offset watermark forward batch_docs at a time
    rows, runs = [], 0
    while runs < 10:
        got_run = drain(200)
        runs += 1
        if not got_run:
            break
        assert min(r["doc_id"] for r in got_run) == len(rows)  # resume point
        rows += got_run
    assert runs >= 4  # 200 / 60 -> 4 non-empty batches
    got = sorted((r["doc_id"], r["text"], r["n_chars"]) for r in rows)
    want = sorted(
        (r["doc_id"], r["text"], r["n_chars"])
        for r in load(registered, n_docs=200).collect()
    )
    assert got == want
