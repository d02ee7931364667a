"""End-of-round closeout: a suite-green-at-snapshot proof the builder
can't skip (round-8 verdict ask #1 — the round-8 "407 passed" claim was
stale by the final SCALE.md edit, and the judge found pytest red at
HEAD).

Runs the full parallel suite against the CURRENT tree, then writes
CLOSEOUT.json recording the git HEAD sha, whether the tree was dirty,
the suite return code, and the per-group tails. The convention (CLAUDE.md):
run this as the LAST step before the end-of-round snapshot commit and
commit CLOSEOUT.json in that snapshot — a judge (or the next round's
builder) verifies freshness by checking `head_sha` is the snapshot's
parent and `dirty` only lists the round-report files. Any edit after the
run shows up as a sha/dirty mismatch; there is no way to carry a stale
"suite green" claim forward.

Usage: python tools/closeout.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=HERE, capture_output=True, text=True
    ).stdout.strip()
    dirty = [
        line
        for line in subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=HERE,
            capture_output=True,
            text=True,
        ).stdout.splitlines()
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
    out = {
        "head_sha": head,
        "dirty_at_run": dirty,
        "suite_rc": suite.returncode,
        "suite_tail": tail,
    }
    with open(os.path.join(HERE, "CLOSEOUT.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    sys.exit(suite.returncode)


if __name__ == "__main__":
    main()
