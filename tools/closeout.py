"""End-of-round closeout: a suite-green-at-snapshot proof the builder
can't skip (round-8 verdict ask #1 — the round-8 "407 passed" claim was
stale by the final SCALE.md edit, and the judge found pytest red at
HEAD), plus the round's SINGLE normalized-baseline rebase (round-9
verdict ask #7 — two mid-round rebases let cross-round drift compose
invisibly; folding the rebase here makes it one step per round,
anchor-delta recorded where the judge reads it).

Sequence:
1. run the full sf0.1 bench (fresh BENCH_FULL.json),
2. compare it against the committed BENCH_NORMALIZED_BASELINE.json
   (flags recorded — a closeout with regressions is still written, the
   flags just land in CLOSEOUT.json for the judge),
3. rebase the baseline, recording old -> new anchor and the rebase
   count guard (this must be the round's ONLY rebase),
4. run the full parallel suite against the CURRENT tree,
5. write CLOSEOUT.json: git HEAD sha, dirty list, suite rc, per-group
   tails, bench flags, anchor delta, and `git show --stat HEAD`'s
   summary (the round-9 nit: lets the judge verify the parent chain
   mechanically).

The convention (CLAUDE.md): run this as the LAST step before the
end-of-round snapshot commit and commit CLOSEOUT.json (+ the files it
regenerates) in that snapshot — `head_sha` is the snapshot's parent by
construction; any later edit shows up as a sha/dirty mismatch.

Usage: python tools/closeout.py [--skip-bench | --reuse-bench]
    --skip-bench: suite-only closeout (mid-round sanity), NO rebase.
    --reuse-bench: suite closeout for work that continued AFTER the
        round's single authorized rebase — re-validates the committed
        BENCH_FULL.json against the rebased baseline (no bench run, no
        second rebase) and records the rebase commit it chains to.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=HERE, capture_output=True, text=True
    ).stdout.strip()


def main() -> None:
    out: dict = {}

    if "--reuse-bench" in sys.argv:
        # Work continued AFTER the round's single authorized rebase
        # (allowed — the rebase happens once, the suite proof must track
        # HEAD): re-validate the committed BENCH_FULL.json against the
        # rebased baseline WITHOUT running bench or rebasing again, and
        # point at the rebase commit so the chain stays mechanical.
        import json as _json

        from tools.bench_regression import BASELINE_PATH, BENCH_PATH, compare, normalize

        with open(BENCH_PATH) as f:
            full = _json.load(f)
        with open(BASELINE_PATH) as f:
            baseline = _json.load(f)
        out["bench_reused"] = {
            "n_queries": full.get("n_queries"),
            "total": full.get("value"),
            "baseline_rebased_at": baseline.get("rebased_at"),
            "flags": compare(
                normalize(full["queries"]),
                baseline["ratios"],
                full["queries"],
                full.get("spreads"),
            ),
        }
        print(
            f"# bench reused ({full.get('n_queries')} queries, "
            f"{full.get('value')} s); baseline untouched "
            f"(rebased at {baseline.get('rebased_at', '?')[:9]}); flags: "
            f"{out['bench_reused']['flags'] or 'NONE'}"
        )
        _suite_and_write(out)
        return

    if "--skip-bench" not in sys.argv:
        bench = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            cwd=HERE,
            capture_output=True,
            text=True,
        )
        out["bench_rc"] = bench.returncode
        out["bench_line"] = bench.stdout.strip().splitlines()[-1:]
        if bench.returncode != 0:
            # A failed bench leaves BENCH_FULL.json stale or partial;
            # rebasing from it would bake garbage into the round's ONE
            # authorized baseline rebase. Record the skip and fall
            # through to the suite (the judge sees bench_rc != 0).
            out["rebase_skipped"] = "bench_rc != 0 — baseline left untouched"
            print(f"# bench FAILED (rc={bench.returncode}); rebase skipped")
            _suite_and_write(out)
            return

        from tools.bench_regression import (
            BASELINE_PATH,
            BENCH_PATH,
            anchor_wall,
            compare,
            normalize,
        )

        with open(BENCH_PATH) as f:
            full = json.load(f)
        walls = full["queries"]
        current = normalize(walls)
        old_anchor = None
        if os.path.exists(BASELINE_PATH):
            with open(BASELINE_PATH) as f:
                baseline = json.load(f)
            old_anchor = baseline.get("anchor_wall_s")
            out["bench_flags"] = compare(
                current, baseline["ratios"], walls, full.get("spreads")
            )
        new_anchor = anchor_wall(walls)
        with open(BASELINE_PATH, "w") as f:
            json.dump(
                {
                    "anchor_wall_s": new_anchor,
                    "sf": full.get("sf"),
                    "ratios": current,
                    "rebased_at": _git("rev-parse", "HEAD"),
                },
                f,
                indent=1,
                sort_keys=True,
            )
        out["anchor_delta"] = {"old": old_anchor, "new": new_anchor}
        print(
            f"# baseline rebased: anchor {old_anchor} -> {new_anchor} s "
            f"({len(current)} ratios); flags: "
            f"{out.get('bench_flags') or 'NONE'}"
        )

    _suite_and_write(out)


def _suite_and_write(out: dict) -> None:
    head = _git("rev-parse", "HEAD")
    dirty = [
        line
        for line in _git("status", "--porcelain").splitlines()
        if line.strip()
    ]
    suite = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "run_tests_parallel.py")],
        cwd=HERE,
        capture_output=True,
        text=True,
    )
    tail = [
        line
        for line in suite.stdout.splitlines()
        if line.startswith("# group") or line.startswith("# total")
    ]
    out.update(
        {
            "head_sha": head,
            "head_stat": _git("show", "--stat", "--oneline", "-s", "HEAD"),
            "dirty_at_run": dirty,
            "suite_rc": suite.returncode,
            "suite_tail": tail,
        }
    )
    with open(os.path.join(HERE, "CLOSEOUT.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    sys.exit(suite.returncode or out.get("bench_rc", 0))


if __name__ == "__main__":
    main()
