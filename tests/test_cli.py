"""CLI parity (distgrep_spark/cli.py vs reference client.go): flags,
output format (Freq.\\tLine header then freq<TAB>line rows), highlight.
One subprocess run (own JVM, ~20 s) covers the end-to-end path; parser
behavior is tested in-process."""

from __future__ import annotations

import subprocess
import sys

import pytest

from distgrep_spark.cli import build_parser


def test_parser_defaults():
    a = build_parser().parse_args(["-f", "x.txt", "-substr", "Achille"])
    assert (a.file, a.pattern) == ("x.txt", "Achille")
    assert a.master == "local[*]"
    assert a.highlight == "none"  # reference default is hl=none-equivalent
    assert not a.regex and not a.ignore_case and not a.ordered


def test_parser_rejects_bad_highlight():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["-f", "x", "-substr", "y", "-hl", "bogus"])


def test_end_to_end_output_format(tmp_path):
    src = tmp_path / "in.txt"
    src.write_text("ba\nba\nxa\nzz\n")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "distgrep_spark.cli",
            "-f",
            str(src),
            "-substr",
            "a",
            "-hl",
            "asterisks",
            "--ordered",
            "-s",
            "local[2]",
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = proc.stdout.strip().splitlines()
    assert lines[0] == "Freq.\tLine"
    assert lines[1] == "---"
    assert lines[2:] == ["2\tb*a*", "1\tx*a*"]


def test_cli_sql_mode_outputs_tsv(tmp_path):
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "distgrep_spark.cli",
            "--sql",
            "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1",
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert out.returncode == 0, out.stderr[-800:]
    lines = out.stdout.strip().splitlines()
    assert lines[0] == "o_orderstatus\tn"
    assert len(lines) == 4  # header + F/O/P
    assert all("\t" in ln for ln in lines[1:])


def test_cli_sql_explain_prints_plan(tmp_path):
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "distgrep_spark.cli",
            "--sql",
            "SELECT count(*) AS n FROM lineitem WHERE l_quantity > 40",
            "--explain",
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "Physical Plan" in out.stdout
    assert "Scan parquet" in out.stdout
    # pushdown visible from the CLI too
    assert "PushedFilters" in out.stdout


def test_cli_requires_grep_args_or_sql():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "distgrep_spark.cli"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 2
    assert "either --sql or both -f and -substr" in out.stderr
