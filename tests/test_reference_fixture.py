"""Parity against the reference's OWN fixture: the altered Italian Iliad
Book I (the only dataset distgrep ships; README.md:25). The engine must
reproduce the exact counts the reference's demo produces — including the
deliberately repeated lines that make GROUP BY line non-trivial.

/root/reference is read-only; the file is read as data, nothing else."""

from __future__ import annotations

from collections import Counter
from pathlib import Path

import pytest

from distgrep_spark.operators.grep import distgrep
from distgrep_spark.sources.readers import read_lines

ILIAD = "/root/reference/ILIAD_1STBOOK_IT_ALTERED"

pytestmark = pytest.mark.skipif(
    not Path(ILIAD).exists(), reason="reference fixture not present"
)


@pytest.fixture(scope="module")
def iliad_result(spark):
    df = distgrep(read_lines(spark, ILIAD), "Achille", column="value")
    return {r["line"]: r["freq"] for r in df.collect()}


def test_matches_reference_documented_counts(iliad_result):
    """SURVEY §5.1 facts, derived from the reference README/demo: 34
    matching lines over 22 distinct lines; the planted 6x repeat."""
    assert sum(iliad_result.values()) == 34
    assert len(iliad_result) == 22
    assert iliad_result["il re de' prodi Atride e il divo Achille."] == 6
    assert iliad_result["Cantami, o Diva, del Pelìde Achille"] == 5


def test_matches_counter_oracle_on_reference_fixture(spark, iliad_result):
    """Full-distribution check, not just the headline numbers — and on
    the default pattern the reference client hard-codes (client.go:26)."""
    lines = Path(ILIAD).read_text(encoding="utf-8").splitlines()
    want = Counter(line for line in lines if "Achille" in line)
    assert iliad_result == dict(want)


def test_case_sensitivity_matches_reference(spark):
    """worker.go:33 is strings.Count — case-sensitive: 'achille'
    (lowercase) must match different lines than 'Achille'."""
    lower = distgrep(read_lines(spark, ILIAD), "achille", column="value")
    lines = Path(ILIAD).read_text(encoding="utf-8").splitlines()
    want = Counter(line for line in lines if "achille" in line)
    got = {r["line"]: r["freq"] for r in lower.collect()}
    assert got == dict(want)
    assert sum(got.values()) != 34  # different case -> different match set
