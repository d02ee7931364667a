"""Command-line client — parity with the reference's client entry point.

The reference client (client.go:25-29) takes ``-f`` (file), ``-substr``
(pattern), ``-s`` (server address), ``-hl`` (highlight mode) and prints
``Freq.\\tLine`` then one ``<freq>\\t<line>`` row per distinct matching
line (client.go:80, server.go:229-235). This CLI keeps the flags
(``-s`` becomes the Spark master URL — the "server" of a Spark engine)
and the output format, adds ``--regex``/``--ignore-case`` for the
superset modes, and ``--ordered`` for stable output (the reference is
explicitly unordered, README.md:32-34, so unordered stays the default).

Usage::

    python -m distgrep_spark.cli -f ILIAD.txt -substr Achille -hl classic
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="distgrep", description="distributed grep on Spark"
    )
    p.add_argument("-f", "--file", required=True, help="input text file/glob")
    p.add_argument("-substr", "--pattern", required=True, help="pattern to match")
    p.add_argument(
        "-s", "--master", default="local[*]", help="Spark master URL (default local[*])"
    )
    p.add_argument(
        "-hl",
        "--highlight",
        choices=["classic", "asterisks", "none"],
        default="none",
        help="highlight matches in output (reference client.go:17-21)",
    )
    p.add_argument("--regex", action="store_true", help="treat pattern as regex")
    p.add_argument("--ignore-case", action="store_true")
    p.add_argument("--ordered", action="store_true", help="sort by freq desc, line")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from distgrep_spark.operators.grep import distgrep, highlight
    from distgrep_spark.session import get_spark
    from distgrep_spark.sources.readers import read_lines

    spark = get_spark("distgrep-cli", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        df = distgrep(
            read_lines(spark, args.file),
            args.pattern,
            column="value",
            mode="regex" if args.regex else "contains",
            case_sensitive=not args.ignore_case,
            ordered=args.ordered,
        )
        if args.highlight != "none" and not args.regex:
            df = highlight(df, args.pattern, column="line", style=args.highlight)
        print("Freq.\tLine\n---")
        for row in df.toLocalIterator():
            print(f"{row['freq']}\t{row['line']}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
