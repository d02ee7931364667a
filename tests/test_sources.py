"""Source readers (sources/readers.py): explicit-schema csv/json reads
(never inference — that's a second scan of the input at 100 TB) and the
malformed-row discipline."""

from __future__ import annotations

from distgrep_spark.sources.readers import read_csv, read_json, read_lines


def test_read_lines_strips_newlines_like_reference(spark, tmp_path):
    """bufio.ScanLines parity (reference server.go:41-49): \\n and \\r\\n
    both delimit; neither appears in the row values."""
    p = tmp_path / "mixed.txt"
    p.write_bytes(b"unix\nwindows\r\nlast")
    vals = {r["value"] for r in read_lines(spark, str(p)).collect()}
    assert vals == {"unix", "windows", "last"}


def test_read_csv_explicit_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("k;v\n1;one\n2;two\n")
    df = read_csv(spark, str(p), "k int, v string", sep=";")
    assert df.schema.simpleString() == "struct<k:int,v:string>"
    assert sorted(map(tuple, df.collect())) == [(1, "one"), (2, "two")]


def test_read_csv_malformed_rows_null_not_crash(spark, tmp_path):
    """Permissive mode: a malformed cell nulls, it doesn't kill the job
    (the reference's failure mode IS a crash — server.go:55 log.Fatalf)."""
    p = tmp_path / "bad.csv"
    p.write_text("k,v\n1,one\nnot_an_int,two\n")
    rows = {
        tuple(r) for r in read_csv(spark, str(p), "k int, v string").collect()
    }
    assert rows == {(None, "two"), (1, "one")}


def test_read_json_explicit_schema(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"k": 1, "tags": ["a"]}\n{"k": 2, "tags": []}\n')
    df = read_json(spark, str(p), "k long, tags array<string>")
    assert {r["k"]: r["tags"] for r in df.collect()} == {1: ["a"], 2: []}


def test_metadata_columns_for_lineage(spark, tmp_path):
    """_metadata.file_path/file_name: per-row provenance without a
    schema change — at 100 TB the only way to answer 'which input file
    produced this bad row' without re-deriving partitioning."""
    d = tmp_path / "lineage"
    spark.createDataFrame([(1,), (2,)], "x int").write.parquet(str(d / "a"))
    spark.createDataFrame([(3,)], "x int").write.parquet(str(d / "b"))
    df = spark.read.parquet(str(d / "*")).select(
        "x", "_metadata.file_path"
    )
    rows = {r["x"]: r["file_path"] for r in df.collect()}
    assert "/a/" in rows[1] and "/a/" in rows[2] and "/b/" in rows[3]


def test_read_json_quarantines_corrupt_records(spark, tmp_path):
    """PERMISSIVE + columnNameOfCorruptRecord: bad JSON lines land whole
    in a quarantine column instead of killing the job — the 100 TB
    ingest contract (a crawl always contains garbage; fail-fast on one
    bad line of a billion is not an option, silently dropping it is an
    audit hole). Good rows parse, bad rows keep their raw text for a
    dead-letter sink."""
    p = tmp_path / "in.json"
    p.write_text('{"k": 1, "v": "ok"}\n{not json at all\n{"k": 3, "v": "also ok"}\n')
    df = (
        spark.read.schema("k long, v string, _bad string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(str(p))
    )
    rows = df.collect()
    good = {r["k"]: r["v"] for r in rows if r["_bad"] is None}
    bad = [r["_bad"] for r in rows if r["_bad"] is not None]
    assert good == {1: "ok", 3: "also ok"}
    assert bad == ["{not json at all"]


def test_orc_roundtrip_pushdown_and_content(spark, tmp_path):
    """ORC scan supports filter pushdown + column pruning like parquet
    (the source_orc_roundtrip docstring's claim), and the roundtrip
    preserves content bytes."""
    src = spark.range(100).selectExpr(
        "id", "CAST(id AS STRING) AS s", "id % 7 AS k"
    )
    path = str(tmp_path / "orc")
    src.write.orc(path)
    back = spark.read.schema(src.schema).orc(path)
    plan = (
        back.where("k = 3").select("id")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "k" in plan.split("PushedFilters")[1][:80]
    assert "ReadSchema" in plan
    # content equality via order-insensitive fingerprint
    a = src.selectExpr("sum(id) AS si", "count(DISTINCT s) AS ns").collect()
    b = back.selectExpr("sum(id) AS si", "count(DISTINCT s) AS ns").collect()
    assert a == b


def test_orc_roundtrip_empty_input(spark, tmp_path):
    """Explicit read schema makes an EMPTY ORC write round-trip (no
    cannot-infer-schema error) — the registry empty-input sweep path."""
    src = spark.range(0).selectExpr("id", "CAST(id AS STRING) AS s")
    path = str(tmp_path / "orc_empty")
    src.write.orc(path)
    back = spark.read.schema(src.schema).orc(path)
    assert back.count() == 0
