"""Noise-immune per-query bench regression detection (round-8 verdict
ask #7).

Raw round-over-round walls drift ±10-20% with the VM window (round 7's
own three reps spanned 183-204 s suite-wide), so a real constant-factor
regression up to ~1.2x hides inside the band, and PLAN_BUDGETS.json
catches plan SHAPE, not constants. The fix: normalize every query's
wall by an IN-SESSION anchor — the median wall of the 22 TPC-H shapes
measured in the same bench process. Host speed, JIT state, and cache
temperature hit the anchor and the query alike, so the RATIO
t_query / t_anchor is stable across hosts and rounds; drift in the
ratio is attributable to the query's own plan/constants.

Workflow (per round, after `python bench.py`):

    python tools/bench_regression.py            # compare BENCH_FULL.json
                                                #   vs committed baseline
    python tools/bench_regression.py --rebase   # accept current ratios

Flags a query when its normalized ratio grew > RATIO_LIMIT (1.5x) vs
the committed BENCH_NORMALIZED_BASELINE.json AND its absolute wall
clears WALL_FLOOR_S — sub-half-second movers are plan-overhead noise
(the round-8 "2.07x regression" that was 0.32 s -> 0.67 s). Exit code 1
on flags so round scripts can gate on it. tests/test_registry.py
unit-proves the comparator red on a seeded 2x constant-factor
regression and green on a pure host-speed shift.
"""

from __future__ import annotations

import json
import os
import sys

RATIO_LIMIT = 1.5
# 1.0 s, aligned with the ladder's floor: the round-9 shakedown run
# flagged four 0.56-0.89 s queries whose solo re-measures were AT
# round-8 walls — sub-second medians move with JIT/scheduler state, not
# plans (the round-8 verdict called a 0.67 s "2.07x regression" noise).
WALL_FLOOR_S = 1.0
# A median whose max-min spread exceeds half its value carries no
# signal (round-9 shakedown: dedup_simhash_radius_report's 3.52 s
# median had a 1.82 s spread from one 13 s cold-JIT rep; solo
# re-measure: 2.1-2.4 s warm, BELOW the round-8 wall).
SPREAD_FRACTION_LIMIT = 0.5

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_PATH = os.path.join(HERE, "BENCH_NORMALIZED_BASELINE.json")
BENCH_PATH = os.path.join(HERE, "BENCH_FULL.json")


def anchor_wall(timings: dict[str, float]) -> float:
    """Median wall of the TPC-H shapes measured in the same process."""
    walls = sorted(
        t for n, t in timings.items() if n.startswith("tpch_q") and t >= 0
    )
    if not walls:
        raise SystemExit("no tpch_q* rows in the bench map - cannot anchor")
    return walls[len(walls) // 2]


def normalize(timings: dict[str, float]) -> dict[str, float]:
    a = anchor_wall(timings)
    return {
        n: round(t / a, 3) for n, t in timings.items() if t >= 0
    }


def compare(
    current: dict[str, float],
    baseline: dict[str, float],
    walls: dict[str, float],
    spreads: dict[str, float] | None = None,
) -> list[str]:
    """Flag strings for queries whose anchor-normalized ratio regressed.

    `current`/`baseline` are normalized ratio maps; `walls` is the raw
    per-query wall map of the CURRENT run (for the noise floor);
    `spreads` the per-query max-min across reps (unstable medians carry
    no signal and are reported separately, not flagged). New queries
    (absent from baseline) are not flagged — they enter the baseline at
    the next --rebase."""
    msgs = []
    for name, ratio in sorted(current.items()):
        base = baseline.get(name)
        if base is None or base <= 0:
            continue
        wall = walls.get(name, 0.0)
        if wall < WALL_FLOOR_S:
            continue
        if ratio / base > RATIO_LIMIT:
            spread = (spreads or {}).get(name)
            if spread is not None and spread > SPREAD_FRACTION_LIMIT * wall:
                msgs.append(
                    f"UNSTABLE {name}: normalized {base} -> {ratio} but "
                    f"spread {spread}s on a {wall}s median - re-measure "
                    "solo before believing it"
                )
                continue
            msgs.append(
                f"{name}: normalized {base} -> {ratio} "
                f"({ratio / base:.2f}x, wall {walls[name]}s)"
            )
    return msgs


def main() -> None:
    with open(BENCH_PATH) as f:
        bench = json.load(f)
    walls = bench["queries"]
    current = normalize(walls)
    if "--rebase" in sys.argv:
        payload = {
            "anchor_wall_s": anchor_wall(walls),
            "sf": bench.get("sf"),
            "ratios": current,
        }
        with open(BASELINE_PATH, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(
            f"rebased {len(current)} normalized ratios -> "
            f"{os.path.basename(BASELINE_PATH)} "
            f"(anchor {payload['anchor_wall_s']}s)"
        )
        return
    if not os.path.exists(BASELINE_PATH):
        raise SystemExit("no baseline committed - run with --rebase first")
    with open(BASELINE_PATH) as f:
        baseline = json.load(f)
    msgs = compare(current, baseline["ratios"], walls, bench.get("spreads"))
    for m in msgs:
        print("FLAG ", m)
    # unstable-median rows are advisories (re-measure solo), not gates
    msgs = [m for m in msgs if not m.startswith("UNSTABLE")]
    gone = sorted(set(baseline["ratios"]) - set(current))
    if gone:
        print(f"note: {len(gone)} baseline queries absent from this run")
    print(
        f"\n{len(msgs)} regressions / {len(current)} compared "
        f"(anchor {anchor_wall(walls)}s vs baseline "
        f"{baseline['anchor_wall_s']}s)"
    )
    sys.exit(1 if msgs else 0)


if __name__ == "__main__":
    main()
