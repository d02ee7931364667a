"""Merge check_oracles shard logs into one per-query status JSON.

The full-registry x64 sweep runs as N concurrent check_oracles shards
(round-robin over scoreboard order); this collates their OK/NEAR/ROWS/
FAIL lines into a single {query: {status, rows|error}} map so the sweep
result can be committed (X64_SWEEP.json) and diffed between re-runs.

Usage: python tools/merge_sweep_logs.py out.json log1 [log2 ...]

Spark progress bars end in carriage returns without newlines, so raw
greps glue engine lines mid-line (CLAUDE.md gotcha) — normalize first.
"""

from __future__ import annotations

import json
import re
import sys

LINE = re.compile(r"^(OK|NEAR|ROWS|FAIL)\s+(\S+?):\s*(.*)$")


def parse(paths):
    out = {}
    for p in paths:
        with open(p, errors="replace") as f:
            text = f.read().replace("\r", "\n")
        for line in text.splitlines():
            m = LINE.match(line)
            if not m:
                continue
            status, name, rest = m.groups()
            rec = {"status": status}
            rows = re.match(r"(\d+) rows", rest)
            if rows:
                rec["rows"] = int(rows.group(1))
            if status == "FAIL":
                rec["error"] = rest[:200]
            # last occurrence wins: a later (re-run) log overrides an
            # earlier shard's contention failure
            out[name] = rec
    return out


def main():
    out_path, logs = sys.argv[1], sys.argv[2:]
    merged = parse(logs)
    counts = {}
    for rec in merged.values():
        counts[rec["status"]] = counts.get(rec["status"], 0) + 1
    with open(out_path, "w") as f:
        json.dump({"counts": counts, "queries": merged}, f, indent=1, sort_keys=True)
    print(counts, "->", out_path, f"({len(merged)} queries)")
    for name, rec in sorted(merged.items()):
        if rec["status"] == "FAIL":
            print("FAIL", name, rec.get("error", "")[:120])


if __name__ == "__main__":
    main()
