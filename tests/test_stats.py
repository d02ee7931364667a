"""Property tests for the round-3 batch-8 statistical kernels (DuckDB
value parity itself is covered by tools/check_oracles.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import distgrep_spark.queries as q
from distgrep_spark.sources.catalog import load_table


def test_ols_trend_matches_numpy_lstsq(spark, sf_dir):
    """The integer-sufficient-statistics fit must agree with a dense
    least-squares solve on the raw points (per brand)."""
    import numpy as np

    rows = {r["p_brand"]: r for r in q.QUERIES["stats_ols_trend"](spark, sf_dir).collect()}
    assert rows
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = (
        li.join(part, li.l_partkey == part.p_partkey)
        .selectExpr(
            "p_brand",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS x",
            "CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y",
        )
        .collect()
    )
    by_brand: dict[str, list[tuple[int, int]]] = {}
    for p in pts:
        by_brand.setdefault(p["p_brand"], []).append((p["x"], p["y"]))
    for brand, xy in by_brand.items():
        x = np.array([a for a, _ in xy], dtype=float)
        y = np.array([b for _, b in xy], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        r = rows[brand]
        assert r["n"] == len(xy)
        assert math.isclose(r["slope"], slope, rel_tol=1e-9, abs_tol=1e-6)
        assert math.isclose(r["intercept"], intercept, rel_tol=1e-9, abs_tol=1e-3)
        assert 0.0 <= r["r2"] <= 1.0


def test_autocorr_bounds_and_pair_counts(spark, sf_dir):
    rows = {r["lag_h"]: r for r in q.QUERIES["events_autocorr_hourly"](spark, sf_dir).collect()}
    assert set(rows) == {1, 24}
    # dense spine: n_pairs differs between lags by exactly lag difference
    assert rows[1]["n_pairs"] - rows[24]["n_pairs"] == 23
    for r in rows.values():
        assert -1.0 <= r["acf"] <= 1.0


def test_ab_ztest_matches_python_float_tree(spark, sf_dir):
    (r,) = q.QUERIES["stats_ab_ztest"](spark, sf_dir).collect()
    n_a, x_a, n_b, x_b = r["n_a"], r["x_a"], r["n_b"], r["x_b"]
    assert 0 < x_a < n_a and 0 < x_b < n_b, "threshold must not saturate"
    pool = (x_a + x_b) / (n_a + n_b)
    z = (x_a / n_a - x_b / n_b) / math.sqrt(pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b))
    # same IEEE single-op tree in CPython — bit-identical, not just close
    assert r["z_score"] == z
    assert r["significant_95"] == (abs(z) > 1.959963984540054)


def test_kcore_peel_degrees_monotone(spark, sf_dir):
    rows = q.QUERIES["graph_kcore_peel"](spark, sf_dir).collect()
    assert rows, "co-purchase graph has a 4-core candidate set"
    for r in rows:
        assert r["deg0"] >= 4, "only survivors of the first cut are reported"
        assert 0 <= r["deg1"] <= r["deg0"], "induced degree can only shrink"
        assert r["in_core_next"] == (r["deg1"] >= 4)
    assert any(not r["in_core_next"] for r in rows) or all(
        r["deg1"] == r["deg0"] for r in rows
    ), "either the peel removed something or the graph was already stable"


def test_drift_tv_is_half_l1_of_shares(spark, sf_dir):
    rows = q.QUERIES["drift_tv_stability"](spark, sf_dir).collect()
    assert rows
    tv = {r["tv_distance"] for r in rows}
    assert len(tv) == 1, "tv_distance is a corpus-level constant column"
    tv = tv.pop()
    assert 0.0 <= tv <= 1.0
    assert math.isclose(sum(r["share_ref"] for r in rows), 1.0, rel_tol=1e-9)
    assert math.isclose(sum(r["share_cur"] for r in rows), 1.0, rel_tol=1e-9)
    half_l1 = 0.5 * sum(abs(r["share_ref"] - r["share_cur"]) for r in rows)
    assert math.isclose(tv, half_l1, rel_tol=1e-9)


def test_seasonal_naive_mae_consistency(spark, sf_dir):
    (r,) = q.QUERIES["orders_seasonal_naive_mae"](spark, sf_dir).collect()
    assert r["n_days_scored"] > 0
    assert r["total_abs_err_cents"] >= 0
    assert r["mae_cents"] == r["total_abs_err_cents"] / r["n_days_scored"]
    # dense spine: scored days = span - 7
    daily = load_table(spark, sf_dir, "orders").selectExpr(
        "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS d"
    )
    lo, hi = daily.agg({"d": "min"}).first()[0], daily.agg({"d": "max"}).first()[0]
    assert r["n_days_scored"] == (hi - lo + 1) - 7


def test_recursive_chain_terminal_totals(spark, sf_dir):
    """The deepest hop per customer must equal the customer's sampled
    order count, and its running total must equal the direct sum."""
    chain = q.QUERIES["recursive_order_chain"](spark, sf_dir)
    rows = chain.collect()
    assert rows, "custkey % 97 sample is non-empty at every SF"
    last = {}
    for r in rows:
        cur = last.get(r["o_custkey"])
        if cur is None or r["hop"] > cur["hop"]:
            last[r["o_custkey"]] = r
    direct = {
        r["o_custkey"]: (r["n"], r["total"])
        for r in load_table(spark, sf_dir, "orders")
        .where("o_custkey % 97 = 0")
        .selectExpr(
            "o_custkey", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents"
        )
        .groupBy("o_custkey")
        .agg(
            F.expr("CAST(count(*) AS BIGINT) AS n"),
            F.expr("CAST(sum(cents) AS BIGINT) AS total"),
        )
        .collect()
    }
    assert set(last) == set(direct)
    for ck, r in last.items():
        n, total = direct[ck]
        assert r["hop"] == n
        assert r["running_cents"] == total


def test_funnel_pattern_counts_match_python_re(spark, sf_dir):
    """Java-regex counts must equal Python's re on the same strings
    (both in the backreference-free common dialect)."""
    import re

    rows = q.QUERIES["events_funnel_pattern_regex"](spark, sf_dir).collect()
    assert rows
    pat = re.compile("v[^p]*c[^p]*p")
    for r in rows:
        assert len(r["seq"]) == r["n_events"]
        assert set(r["seq"]) <= set("vcpse")
        assert r["n_funnels"] == len(pat.findall(r["seq"]))
        assert r["converted"] == (r["n_funnels"] > 0)


def test_survival_curve_monotone_and_normalized(spark, sf_dir):
    rows = sorted(
        q.QUERIES["orders_survival_empirical"](spark, sf_dir).collect(),
        key=lambda r: r["latency_days"],
    )
    assert rows
    n = rows[0]["n_at_risk"]  # first event time sees the full cohort at risk
    assert sum(r["n_events"] for r in rows) == n
    prev = 1.0
    at_risk = n
    for r in rows:
        assert r["n_at_risk"] == at_risk
        at_risk -= r["n_events"]
        assert r["survival"] <= prev + 1e-15
        prev = r["survival"]
    assert rows[-1]["survival"] == 0.0, "uncensored data: curve reaches zero"


def test_poisson_bootstrap_weights_distribution(spark, sf_dir):
    rows = q.QUERIES["sample_poisson_bootstrap"](spark, sf_dir).collect()
    assert len(rows) == 16
    assert len({r["replicate_id"] for r in rows}) == 16
    orig = {r["orig_mean_cents"] for r in rows}
    assert len(orig) == 1
    orig = orig.pop()
    n0 = load_table(spark, sf_dir, "orders").count()
    for r in rows:
        # Poisson(1): E[n_eff] = n; loose 5-sigma band (sd = sqrt(n))
        assert abs(r["n_eff"] - n0) < 5 * math.sqrt(n0) + 1
        # replicate means cluster around the original mean
        assert abs(r["boot_mean_cents"] - orig) / orig < 0.2
    # replicates must actually differ (the hash draw is per-replicate)
    assert len({r["boot_mean_cents"] for r in rows}) > 1


def test_linear_interpolate_lies_between_neighbors(spark, sf_dir):
    rows = sorted(
        q.QUERIES["window_linear_interpolate"](spark, sf_dir).collect(),
        key=lambda r: r["d"],
    )
    assert any(r["was_missing"] for r in rows), "series must have gaps"
    assert all(r["filled"] is not None for r in rows)
    obs = [(i, r) for i, r in enumerate(rows) if not r["was_missing"]]
    for i, r in enumerate(rows):
        if not r["was_missing"]:
            assert r["filled"] == float(r["rev"])
            continue
        left = [o for o in obs if o[0] < i]
        right = [o for o in obs if o[0] > i]
        if left and right:
            (li_, lr), (ri_, rr) = left[-1], right[0]
            lo, hi = sorted((float(lr["rev"]), float(rr["rev"])))
            assert lo - 1e-9 <= r["filled"] <= hi + 1e-9
            # exact linear formula
            frac = (r["d"] - lr["d"]) / (rr["d"] - lr["d"])
            expect = float(lr["rev"]) + (float(rr["rev"]) - float(lr["rev"])) * frac
            assert r["filled"] == expect
        elif left:
            assert r["filled"] == float(left[-1][1]["rev"])
        else:
            assert r["filled"] == float(right[0][1]["rev"])


def test_spatial_grid_equals_quadratic(spark, sf_dir):
    """Grid-bucketed pairs must equal the brute-force quadratic, with
    each pair reported exactly once."""
    rows = q.QUERIES["join_spatial_grid"](spark, sf_dir).collect()
    got = {(r["key_a"], r["key_b"]) for r in rows}
    assert len(got) == len(rows), "grid join must not duplicate pairs"
    pts = {
        r["k"]: (r["x"], r["y"])
        for r in load_table(spark, sf_dir, "part")
        .selectExpr(
            "p_partkey AS k",
            "CAST(p_size AS BIGINT) AS x",
            "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) DIV 10 AS y",
        )
        .collect()
    }
    keys = sorted(pts)
    brute = {
        (a, b)
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
        if abs(pts[a][0] - pts[b][0]) <= 2 and abs(pts[a][1] - pts[b][1]) <= 2
    }
    assert got == brute
    for r in rows:
        assert abs(r["dx"]) <= 2 and abs(r["dy"]) <= 2


def test_ks_two_sample_matches_scipy_style(spark, sf_dir):
    (r,) = q.QUERIES["stats_ks_two_sample"](spark, sf_dir).collect()
    assert r["n1"] > 0 and r["n2"] > 0
    assert 0.0 <= r["d_stat"] <= 1.0
    assert r["d_stat"] == r["d_scaled"] / (r["n1"] * r["n2"])
    crit = 1.3581015157406195 * math.sqrt((r["n1"] + r["n2"]) / (r["n1"] * r["n2"]))
    assert r["reject_95"] == (r["d_stat"] > crit)
    # recompute D from the raw bucketed samples
    o = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer").where(
                "c_mktsegment IN ('BUILDING', 'MACHINERY')"
            ),
            F.expr("o_custkey = c_custkey"),
        )
        .selectExpr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100000 AS v",
            "c_mktsegment = 'BUILDING' AS g1",
        )
        .collect()
    )
    s1 = sorted(x["v"] for x in o if x["g1"])
    s2 = sorted(x["v"] for x in o if not x["g1"])
    values = sorted(set(s1) | set(s2))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(s1, v) * len(s2)
            - bisect.bisect_right(s2, v) * len(s1)
        )
        for v in values
    )
    assert r["d_scaled"] == d
    assert (r["n1"], r["n2"]) == (len(s1), len(s2))


def test_rake_keywords_scores_consistent(spark, sf_dir):
    rows = q.QUERIES["text_rake_keywords"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["degree"] >= r["freq"] >= 1, "each occurrence contributes >= 1"
        assert r["score_scaled"] == r["degree"] * 1000000 // r["freq"]
        assert r["word"] not in {"the", "a", "of", "and"}
    # ranking is by the integer score with word tie-break
    ranks = [(-r["score_scaled"], r["word"]) for r in rows]
    assert ranks == sorted(ranks)


def test_zscore_rolling_baseline_excludes_today(spark, sf_dir):
    rows = q.QUERIES["window_zscore_rolling"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 14 <= r["n_baseline"] <= 28
        assert r["anomaly_flag"] == (abs(r["z_score"]) > 3.0)
    # in a stationary synthetic series, anomalies must be rare
    frac = sum(r["anomaly_flag"] for r in rows) / len(rows)
    assert frac < 0.1


def test_skewness_kurtosis_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = {
        r["o_orderpriority"]: r
        for r in q.QUERIES["agg_skewness_kurtosis"](spark, sf_dir).collect()
    }
    pts = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderpriority AS pri",
            "CAST(floor(o_totalprice + 0.5) AS BIGINT) DIV 1000 AS x",
        )
        .collect()
    )
    by = {}
    for p in pts:
        by.setdefault(p["pri"], []).append(p["x"])
    assert set(by) == set(rows)
    for pri, xs in by.items():
        x = np.array(xs, dtype=float)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        skew = ((x - m) ** 3).mean() / m2**1.5
        kurt = ((x - m) ** 4).mean() / m2**2 - 3.0
        r = rows[pri]
        assert r["n"] == len(xs)
        assert math.isclose(r["skewness"], skew, rel_tol=1e-9, abs_tol=1e-9)
        assert math.isclose(r["excess_kurtosis"], kurt, rel_tol=1e-9, abs_tol=1e-9)


def test_interpurchase_gaps_cover_all_repeat_orders(spark, sf_dir):
    rows = q.QUERIES["orders_interpurchase_gaps"](spark, sf_dir).collect()
    assert rows
    total_gaps = sum(r["n_gaps"] for r in rows)
    o = load_table(spark, sf_dir, "orders")
    n_orders = o.count()
    n_customers = o.select("o_custkey").distinct().count()
    assert total_gaps == n_orders - n_customers, "one gap per non-first order"
    assert math.isclose(sum(r["share"] for r in rows), 1.0, rel_tol=1e-9)
    assert all(0 <= r["gap_month_bucket"] <= 12 for r in rows)


def test_haar_energy_matches_python_transform(spark, sf_dir):
    """Engine energies must equal a direct Python Haar computation on
    the same dense series, scale by scale."""
    rows = {r["scale_pow"]: r for r in q.QUERIES["events_haar_energy"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    hours = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
            " DIV 3600000000 AS h"
        )
        .groupBy("h")
        .count()
        .collect()
    )
    counts = {r["h"]: r["count"] for r in hours}
    lo, hi = min(counts), max(counts.keys())
    series = [counts.get(h, 0) for h in range(lo, hi + 1)]
    total_energy = sum(r["energy"] for r in rows.values())
    for k in range(1, 6):
        size = 1 << k
        n_blocks = len(series) // size
        energy = 0
        for b in range(n_blocks):
            block = series[b * size : (b + 1) * size]
            detail = sum(block[: size // 2]) - sum(block[size // 2 :])
            energy += detail * detail
        r = rows[k]
        assert r["block_size"] == size
        assert r["n_blocks"] == n_blocks
        assert r["energy"] == energy
        assert r["energy_share"] == energy / total_energy


def test_watermark_lateness_nonnegative_and_consistent(spark, sf_dir):
    rows = q.QUERIES["events_watermark_lateness_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["max_late_us"] >= 0
        assert 0 <= r["n_late"] < r["n_events"]
        assert r["max_late_sec"] == r["max_late_us"] // 1_000_000
        # a user with any late event has positive max lateness
        assert (r["n_late"] > 0) == (r["max_late_us"] > 0)


def test_stratified_ate_degenerate_stratum_is_null_not_error(spark, tmp_path):
    """A stratum whose orders ALL hash to one arm must yield NULL means
    for the empty arm, never an ANSI DIVIDE_BY_ZERO throw (the round-8
    guard; same convention as stats_ab_power_mde)."""
    import hashlib

    # keys whose md5 first hex digit is < '8' (treatment arm)
    treated = [k for k in range(1, 400)
               if hashlib.md5(str(k).encode()).hexdigest()[0] < "8"][:5]
    control = [k for k in range(1, 400)
               if hashlib.md5(str(k).encode()).hexdigest()[0] >= "8"][:5]
    rows = [(k, "1-URGENT", 100.0 + k) for k in treated]   # all-treated
    rows += [(k, "2-HIGH", 200.0 + k) for k in control]    # all-control
    rows += [(k, "3-MEDIUM", 300.0 + k)
             for k in treated[:2] + control[:2]]           # mixed
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r["stratum"]: r for r in
           q.QUERIES["stats_stratified_ate"](spark, str(tmp_path)).collect()}
    assert out["1-URGENT"]["n_c"] == 0
    assert out["1-URGENT"]["mean_c"] is None
    assert out["1-URGENT"]["ate_cents"] is None
    assert out["1-URGENT"]["mean_t"] is not None
    assert out["2-HIGH"]["n_t"] == 0
    assert out["2-HIGH"]["mean_t"] is None
    assert out["2-HIGH"]["ate_cents"] is None
    assert out["3-MEDIUM"]["ate_cents"] is not None
