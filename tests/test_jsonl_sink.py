"""Round-trip and commit-protocol tests for the jsonl_manifest custom
Python DataSource writer (sources/jsonl_sink.py)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from distgrep_spark.sources.catalog import load_table
from distgrep_spark.sources.jsonl_sink import JsonlManifestSink


def _read_manifest_rows(path: str) -> list[dict]:
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    rows: list[dict] = []
    for entry in manifest["files"]:
        with open(os.path.join(path, entry["filename"])) as pf:
            part = [json.loads(line) for line in pf]
        assert len(part) == entry["n_rows"], "per-file row count must match manifest"
        rows.extend(part)
    assert len(rows) == manifest["n_rows"]
    return rows


def test_jsonl_sink_roundtrip_and_manifest(spark, sf_dir, tmp_path):
    spark.dataSource.register(JsonlManifestSink)
    out = str(tmp_path / "nation_out")
    src = load_table(spark, sf_dir, "nation").repartition(4)
    src.write.format("jsonl_manifest").option("path", out).mode("append").save()

    rows = _read_manifest_rows(out)
    expected = {(r["n_nationkey"], r["n_name"]) for r in src.collect()}
    got = {(r["n_nationkey"], r["n_name"]) for r in rows}
    assert got == expected
    # manifest lists only committed files; every file on disk that is a
    # part file must be in the manifest (no orphans on a clean run)
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        listed = {e["filename"] for e in json.load(f)["files"]}
    on_disk = {n for n in os.listdir(out) if n.startswith("part-")}
    assert on_disk == listed


def test_jsonl_sink_empty_partitions_commit_cleanly(spark, tmp_path):
    spark.dataSource.register(JsonlManifestSink)
    out = str(tmp_path / "empty_out")
    df = spark.range(0).select(F.col("id"))
    df.write.format("jsonl_manifest").option("path", out).mode("append").save()
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == 0


def test_jsonl_sink_orphan_attempts_invisible_to_manifest_readers(
    spark, sf_dir, tmp_path
):
    """Failure injection (round-7 verdict ask #4): part files from
    failed/duplicate attempts — planted both BEFORE and AFTER the real
    job — must be invisible to manifest readers: the manifest lists
    exactly the winning attempts' files and the read path never opens
    an orphan."""
    spark.dataSource.register(JsonlManifestSink)
    out = str(tmp_path / "orphan_out")
    os.makedirs(out)
    # orphan from a PRIOR crashed attempt: valid JSONL, plausible name
    with open(os.path.join(out, "part-00000-deadbeef.jsonl"), "w") as f:
        f.write(json.dumps({"n_nationkey": 999, "n_name": "ORPHAN"}) + "\n")
    src = load_table(spark, sf_dir, "nation").repartition(4)
    src.write.format("jsonl_manifest").option("path", out).mode("append").save()
    # orphan from a zombie attempt racing AFTER commit
    with open(os.path.join(out, "part-00001-cafebabe.jsonl"), "w") as f:
        f.write(json.dumps({"n_nationkey": 998, "n_name": "ZOMBIE"}) + "\n")

    rows = _read_manifest_rows(out)
    expected = {(r["n_nationkey"], r["n_name"]) for r in src.collect()}
    got = {(r["n_nationkey"], r["n_name"]) for r in rows}
    assert got == expected, "manifest readers must see exactly the committed set"
    assert not any(r["n_name"] in ("ORPHAN", "ZOMBIE") for r in rows)
    # the orphans ARE on disk (a directory listing would see them) —
    # the manifest, not the filesystem, defines visibility
    on_disk = {n for n in os.listdir(out) if n.startswith("part-")}
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        listed = {e["filename"] for e in json.load(f)["files"]}
    assert on_disk - listed == {
        "part-00000-deadbeef.jsonl", "part-00001-cafebabe.jsonl"
    }


def test_jsonl_sink_crashed_job_leaves_nothing_visible(spark, tmp_path):
    """Kill a writer mid-job (one task raises after others may have
    written their parts): no _MANIFEST.json may exist, so a manifest
    reader sees NOTHING — and a subsequent successful job on the same
    path commits a manifest covering exactly its own files, with the
    crashed job's orphans still invisible."""
    import pytest

    spark.dataSource.register(JsonlManifestSink)
    out = str(tmp_path / "crash_out")
    poisoned = spark.range(100).repartition(4).selectExpr(
        "CASE WHEN id = 7 THEN raise_error('injected task failure')"
        " ELSE CAST(id AS STRING) END AS s"
    )
    with pytest.raises(Exception, match="injected task failure"):
        poisoned.write.format("jsonl_manifest").option("path", out).mode(
            "append"
        ).save()
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json")), (
        "a crashed job must not publish a manifest"
    )
    orphans = {
        n for n in os.listdir(out) if n.startswith("part-")
    } if os.path.exists(out) else set()

    # recovery: the retried job commits and readers see exactly its rows
    ok = spark.range(10).selectExpr("CAST(id AS STRING) AS s").repartition(2)
    ok.write.format("jsonl_manifest").option("path", out).mode("append").save()
    rows = _read_manifest_rows(out)
    assert {r["s"] for r in rows} == {str(i) for i in range(10)}
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        listed = {e["filename"] for e in json.load(f)["files"]}
    assert listed.isdisjoint(orphans), "manifest must never adopt orphans"


def test_jsonl_sink_speculative_duplicate_attempt_single_copy(spark, tmp_path):
    """Speculation model: two attempts of the SAME partition write two
    distinct files (attempt-unique names — no collision), but Spark
    delivers only the winning attempt's commit message; the manifest
    then exposes exactly one copy of the partition's rows."""
    from types import SimpleNamespace

    from distgrep_spark.sources.jsonl_sink import JsonlManifestWriter

    out = str(tmp_path / "spec_out")
    writer = JsonlManifestWriter({"path": out})
    rows = [SimpleNamespace(asDict=lambda: {"k": 1, "v": "a"}),
            SimpleNamespace(asDict=lambda: {"k": 2, "v": "b"})]
    # two attempts of partition 0 race; both write fully
    m_winner = writer.write(iter(rows))
    m_loser = writer.write(iter(rows))
    assert m_winner.filename != m_loser.filename, "attempt-unique names"
    assert len({n for n in os.listdir(out) if n.startswith("part-")}) == 2
    # the driver commits ONLY the winner (Spark's per-partition contract)
    writer.commit([m_winner])
    got = _read_manifest_rows(out)
    assert sorted((r["k"], r["v"]) for r in got) == [(1, "a"), (2, "b")], (
        "exactly one copy — the loser's file is invisible"
    )
