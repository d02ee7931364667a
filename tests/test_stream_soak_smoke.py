"""Smoke test for the streaming throughput-soak harness
(tools/soak_streaming.py): a few seconds of the tumbling pipeline at a
modest rate must produce progress ticks, keep state bounded (15
window-type rows), and report the metric fields SCALE.md cites — so the
harness can't silently rot between rounds. The full rate ladder and the
session/dedup state-model measurements live in SCALE.md (round 5), not
in the suite."""

from __future__ import annotations

from tools.soak_streaming import PIPELINES, soak


def test_tumbling_soak_reports_metrics(spark):
    # under a saturated box (the suite runs next to other Spark
    # sessions) 8 s can end before the first completed-batch tick;
    # retry once with a longer window before judging the harness
    for seconds in (8, 25):
        r = soak(spark, "tumbling", 50_000, seconds)
        if "error" not in r and r["proc_rows_per_s"] > 0:
            break
    assert "error" not in r, r
    assert r["batches"] >= 1
    assert r["proc_rows_per_s"] > 0
    # 5s windows x (view/click/purchase/error/scroll): state stays a
    # handful of rows, never per-event
    assert 0 < r["state_rows_last"] <= 100
    for field in ("keeping_up", "watermark_lag_s", "state_growth_post_horizon"):
        assert field in r


def test_pipeline_table_is_complete():
    assert set(PIPELINES) == {"tumbling", "session", "dedup"}
    for fn, mode in PIPELINES.values():
        assert mode in {"update", "append", "complete"}
