"""A/B: monolithic 355-query bench session vs N fresh-session shards
(round-11 verdict ask #2 — root-cause the round-10 'long-session bench
inflation' that SCALE.md left at "slow-VM window").

Design: the monolithic run and the sharded run execute the SAME
queries with the SAME per-query protocol (median of reps, noop sink,
per-shard warm-up unbilled); the only variable is session lifetime.
Runs alternate M,S,M,S so slow-VM drift hits both arms symmetrically.
Everything is SEQUENTIAL — a concurrent shard run would confound the
comparison with contention (the round-9 ladder lesson).

Decision rule (from the verdict): if sharded == monolithic (per-query
ratios ~1 on the >=1 s population), the round-10 inflation was VM
drift — record and close. If sharded is systematically faster, session
state is a real cost and bench.py should shard by default (one
baseline rebase at the round's closeout).

Usage: python tools/ab_bench_shards.py [rounds] [n_shards]
Writes AB_BENCH_SHARDS.json and prints a summary JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(env_extra: dict, out_path: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_BENCH_OUT=out_path, **env_extra)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=HERE,
    )
    wall = round(time.perf_counter() - t0, 1)
    if proc.returncode != 0:
        raise RuntimeError(f"bench rc={proc.returncode}: {proc.stderr[-500:]}")
    with open(out_path) as f:
        full = json.load(f)
    full["process_wall_s"] = wall
    return full


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    tmp = os.path.join(HERE, ".tmp")
    os.makedirs(tmp, exist_ok=True)

    results = {"mono": [], "sharded": []}
    for r in range(rounds):
        mono = _run({}, os.path.join(tmp, f"ab_mono_{r}.json"))
        results["mono"].append(
            {
                "total": mono["value"],
                "queries": mono["queries"],
                "process_wall_s": mono["process_wall_s"],
            }
        )
        print(
            json.dumps({"arm": "mono", "round": r, "total": mono["value"]}),
            flush=True,
        )
        merged: dict[str, float] = {}
        walls = 0.0
        for i in range(n_shards):
            sh = _run(
                {"SPARK_GRAFT_BENCH_SHARD": f"{i}/{n_shards}"},
                os.path.join(tmp, f"ab_shard_{r}_{i}.json"),
            )
            merged.update(sh["queries"])
            walls += sh["process_wall_s"]
        total = round(sum(t for t in merged.values() if t >= 0), 3)
        results["sharded"].append(
            {"total": total, "queries": merged, "process_wall_s": round(walls, 1)}
        )
        print(
            json.dumps({"arm": "sharded", "round": r, "total": total}),
            flush=True,
        )

    # Per-query geometric-mean ratio on the stable (>=1 s mono) slice —
    # sub-second medians carry no signal (round-9 shakedown lesson).
    import math

    # min over rounds, tolerant of a registry that changed between runs
    # (compare only keys present in BOTH arms' every-round minimum)
    mono_q: dict[str, float] = {}
    for m in results["mono"]:
        for k, v in m["queries"].items():
            if v >= 0:
                mono_q[k] = min(mono_q.get(k, float("inf")), v)
    shard_q: dict[str, float] = {}
    for s in results["sharded"]:
        for k, v in s["queries"].items():
            if v >= 0:
                shard_q[k] = min(shard_q.get(k, float("inf")), v)
    ratios = {
        k: round(shard_q[k] / mono_q[k], 3)
        for k in mono_q
        if k in shard_q and mono_q[k] >= 1.0 and shard_q[k] >= 0
    }
    gm = round(
        math.exp(sum(math.log(v) for v in ratios.values()) / len(ratios)), 3
    ) if ratios else None
    summary = {
        "ab": "bench_shards",
        "rounds": rounds,
        "n_shards": n_shards,
        "mono_totals": [m["total"] for m in results["mono"]],
        "sharded_totals": [s["total"] for s in results["sharded"]],
        "mono_process_wall_s": [m["process_wall_s"] for m in results["mono"]],
        "sharded_process_wall_s": [
            s["process_wall_s"] for s in results["sharded"]
        ],
        "n_stable_queries": len(ratios),
        "geomean_shard_over_mono_ge1s": gm,
        "biggest_shard_wins": sorted(ratios.items(), key=lambda kv: kv[1])[:8],
        "biggest_mono_wins": sorted(ratios.items(), key=lambda kv: kv[1])[-8:],
    }
    with open(os.path.join(HERE, "AB_BENCH_SHARDS.json"), "w") as f:
        json.dump(dict(summary, results=results), f, indent=1, sort_keys=True)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
