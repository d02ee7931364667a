"""Registry contract sanity: the driver-facing surface stays coherent
as queries accumulate."""

from __future__ import annotations

import re

import distgrep_spark.queries as q
import __spark_entry__ as entry


def test_every_oracle_has_a_query():
    assert set(q.ORACLES) <= set(q.QUERIES)


def test_names_are_snake_case():
    assert all(re.fullmatch(r"[a-z0-9_]+", n) for n in q.QUERIES)


def test_entry_module_mirrors_registry():
    assert entry.queries().keys() == q.QUERIES.keys()
    assert entry.oracle_sql().keys() == q.ORACLES.keys()


def test_scoreboard_prefix_is_first_and_complete():
    """The driver scores a ~50-query prefix of queries() in dict order;
    the curated SCOREBOARD_PREFIX must actually BE that prefix, contain
    no unknown names, and carry a full DuckDB oracle on EVERY entry — a
    rows-only query can never turn its scored row green, so it would
    waste the slot (round 2 lost a row to kmeans_clusters this way)."""
    names = list(entry.queries())
    pref = entry.SCOREBOARD_PREFIX
    assert len(pref) == 50
    assert names[: len(pref)] == pref
    rows_only_in_prefix = [n for n in pref if n not in q.ORACLES]
    assert rows_only_in_prefix == []
    # oracle dict must lead with the same ordering (minus rows-only)
    assert list(entry.oracle_sql())[:10] == [n for n in pref if n in q.ORACLES][:10]


def test_oracles_use_engine_neutral_aggregate_types():
    """Pin the result-TYPE convention the round-2 driver failures taught:
    an oracle's aggregate output must be an engine-neutral type, because
    the driver's value hash is type-sensitive even on byte-identical
    values. Spark widens a DECIMAL(25,6) sum to DECIMAL(35,6) where
    DuckDB widens to DECIMAL(38,6), and DuckDB's integer ``sum`` is
    HUGEINT where Spark's is BIGINT — so every hazardous ``sum`` must be
    wrapped in an explicit CAST (``sql_dsum`` / ``AS BIGINT``). This
    regex lint is the fast textual subset; tools/check_oracles.py's
    runtime dtype pass is the complete gate."""
    hazards = {
        # raw decimal sum: engine-dependent result width
        "decimal-sum": re.compile(r"(?<!CAST\()sum\s*\(\s*CAST\s*\([^)]*AS\s+DECIMAL", re.I),
        # bare conditional count: HUGEINT in DuckDB, BIGINT in Spark
        "case-sum": re.compile(r"(?<!CAST\()sum\s*\(\s*CASE\b", re.I),
        # sums of integer-valued length functions: same HUGEINT hazard
        "intfn-sum": re.compile(r"(?<!CAST\()sum\s*\(\s*(?:len|length)\s*\(", re.I),
    }
    bad = [
        (name, kind)
        for name, sql in q.ORACLES.items()
        for kind, rx in hazards.items()
        if rx.search(sql)
    ]
    assert not bad, (
        f"oracles with engine-dependent aggregate result types: {bad}; "
        "wrap the sum in CAST(... AS DOUBLE) (sql_dsum) or CAST(... AS BIGINT)"
    )


def test_rows_only_queries_are_documented_exceptions():
    """Every oracle-less query must be a sketch/iterative/UDF path — the
    kinds the driver contract exempts — listed here EXPLICITLY so adding
    an undocumented rows-only query fails review."""
    expected_rows_only = {
        "agg_approx_distinct",      # HLL estimates are engine-specific
        "dedup_minhash_lsh",        # xxhash64 sketch
        "dedup_simhash",            # xxhash64 sketch
        "sim_ann_lsh",              # engine-side hyperplane buckets
        "sim_ann_ivf",              # engine-side centroid buckets
        "kmeans_clusters",          # iterative, float-order dependent
        "text_fingerprints",        # xxhash64 rolling hash
        "multimodal_byte_features", # Pandas-UDF path, pytest-checked
        "sim_cosine_topk_pandas",   # BLAS scorer differs from HOF in last ulp
    }
    assert set(q.QUERIES) - set(q.ORACLES) == expected_rows_only


def test_every_oracle_is_live_at_sf001():
    """Oracle-liveness lint (round-4 verdict ask): an oracle that
    returns ZERO rows at sf0.01 certifies nothing — the round-3
    ``join_anti`` vacuity (0 rows silently 'passing' for two rounds)
    was caught by hand review. This runs every registered oracle
    DuckDB-side with a LIMIT-1 wrapper (~5 s for all 246; parity with
    the Spark side is check_oracles' job) and pins the explicit
    zero-row allowlist. New intentionally-empty queries must be added
    HERE, with a reason."""
    import duckdb

    from tests.conftest import SF_ORACLE

    zero_row_allowlist = {
        "grep_zero_matches",  # 0-row parity with the reference IS the test
    }
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    vacuous = [
        name
        for name, sql in q.ORACLES.items()
        if name not in zero_row_allowlist
        and not con.execute(f"SELECT 1 FROM ({sql}) LIMIT 1").fetchall()
    ]
    assert not vacuous, (
        f"vacuous oracles (0 rows at sf0.01): {vacuous}; a 0-row oracle "
        "certifies nothing — fix the predicate or allowlist with a reason"
    )
    dead_allowlist = zero_row_allowlist - set(q.ORACLES)
    assert not dead_allowlist, f"allowlisted names not in registry: {dead_allowlist}"


def test_plan_audit_single_partition_windows_are_allowlisted():
    """The committed PLAN_AUDIT.json must show no Window fed by an
    Exchange SinglePartition outside tools/plan_audit.py's justified
    allowlist (bounded-cardinality window inputs only). Unbounded-entity
    rank/cumsum queries must use operators/distrank.py — the round-4
    'global-window order statistics' scale-killer class, automated."""
    import json
    import os

    from tools.plan_audit import SP_WINDOW_ALLOWLIST

    path = os.path.join(os.path.dirname(__file__), "..", "PLAN_AUDIT.json")
    audit = json.load(open(path))
    offenders = sorted(
        name
        for name, stats in audit.items()
        if stats.get("sp_windows", 0) and name not in SP_WINDOW_ALLOWLIST
    )
    assert not offenders, (
        f"single-partition windows outside allowlist: {offenders}; "
        "use operators/distrank.py or justify in SP_WINDOW_ALLOWLIST"
    )
    stale = sorted(set(SP_WINDOW_ALLOWLIST) - set(q.QUERIES))
    assert not stale, f"allowlist entries not in registry: {stale}"


def test_topk_gate_preconditions():
    """agg_approx_topk_merge_gate's exact-by-theorem certification has
    two silent-failure preconditions (round-4 advice): the sentinel row
    must never collide with a real (source, lang) value, and distinct
    langs must stay below the estimate's k=64 — past it the estimate
    truncates and the 'theorem' quietly stops holding. Pin both against
    the fixtures DuckDB-side (cheap; no Spark session)."""
    import duckdb

    from tests.conftest import SF_ORACLE

    sentinel = "__sg_sentinel_7f3a9c1e4b5d6021__"
    con = duckdb.connect()
    n_langs, n_hits = con.execute(
        f"""SELECT count(DISTINCT lang),
                   count(*) FILTER (lang = '{sentinel}' OR source = '{sentinel}')
            FROM '{SF_ORACLE}/documents.parquet'"""
    ).fetchone()
    assert n_hits == 0
    assert n_langs < 64, f"{n_langs} langs reach the estimate's k=64 truncation"
