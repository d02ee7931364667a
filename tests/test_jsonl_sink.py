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
