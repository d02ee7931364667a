"""Text-analysis operator tests (python oracles for the pieces DuckDB
doesn't cover: rolling fingerprint order-sensitivity, quality bounds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distgrep_spark.operators.text import (
    STOPWORDS,
    fingerprints,
    lang_guess,
    quality_score,
    text_stats,
    token_counts_by,
)

DOCS = [
    (0, "the quick brown fox", "en"),
    (1, "a a a the the of", "en"),
    (2, "fox brown quick the", "en"),  # reordering of 0
    (3, "word", "de"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def test_text_stats_python_oracle(docs_df):
    rows = {r["doc_id"]: r for r in text_stats(docs_df).collect()}
    for doc_id, text, _ in DOCS:
        toks = text.split()
        r = rows[doc_id]
        assert r["n_chars_calc"] == len(text)
        assert r["n_tokens"] == len(toks)
        assert r["avg_token_len"] == pytest.approx(sum(map(len, toks)) / len(toks))
        assert r["stop_ratio"] == pytest.approx(
            sum(t in STOPWORDS for t in toks) / len(toks)
        )


def test_quality_bounds(docs_df):
    for r in quality_score(docs_df).collect():
        assert 0.0 <= r["quality"] <= 1.0


def test_lang_guess_rule(docs_df):
    got = {r["doc_id"]: r["lang_guess"] for r in lang_guess(docs_df).collect()}
    assert got[1] == "en_like"  # stopword-dense
    assert got[3] == "other"  # no stopwords


def test_fingerprint_order_sensitive(docs_df):
    fps = {r["doc_id"]: r for r in fingerprints(docs_df).collect()}
    # doc 2 is a token reordering of doc 0: rolling hash differs, md5 differs
    assert fps[0]["fp_rolling"] != fps[2]["fp_rolling"]
    assert fps[0]["fp_md5"] != fps[2]["fp_md5"]
    # determinism across runs
    again = {r["doc_id"]: r for r in fingerprints(docs_df).collect()}
    assert fps[0]["fp_rolling"] == again[0]["fp_rolling"]


def test_token_counts_by_lang(docs_df):
    got = {r["lang"]: r for r in token_counts_by(docs_df, "lang").collect()}
    assert got["en"]["n_docs"] == 3
    assert got["en"]["ws_tokens"] == 4 + 6 + 4
    assert got["de"]["ws_tokens"] == 1
    assert got["en"]["total_chars"] == sum(len(t) for _, t, lang in DOCS if lang == "en")
