"""Hypothesis property tests for the corpus-level text operators
(operators/text.py: remove_dup_sentences, dup_span_fraction) against
naive driver-side reference implementations on arbitrary small corpora.
Small vocabularies force cross-document collisions."""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distgrep_spark.operators.text import dup_span_fraction, remove_dup_sentences

_WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
_SENT = st.lists(_WORD, min_size=1, max_size=3).map(" ".join)
_DOC = st.lists(_SENT, min_size=1, max_size=4).map(". ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=5)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_remove_dup_sentences_matches_reference(spark, corpus):
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in remove_dup_sentences(df).collect()}

    # reference: sentence -> set of docs; keep sentences unique to one doc
    sent_docs = defaultdict(set)
    split = {i: [s for s in t.split(". ") if s != ""] for i, t in rows}
    for i, sents in split.items():
        for s in sents:
            sent_docs[s].add(i)
    for i, sents in split.items():
        kept = [s for s in sents if len(sent_docs[s]) == 1]
        assert got[i]["n_sents"] == len(sents)
        assert got[i]["n_kept"] == len(kept)
        assert got[i]["clean_text"] == ". ".join(kept)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_dup_span_fraction_matches_reference(spark, corpus):
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dup_span_fraction(df, n=2).collect()}

    def grams(text):
        toks = text.strip().split()
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    gdocs = defaultdict(set)
    per_doc = {i: grams(t) for i, t in rows}
    for i, gs in per_doc.items():
        for g in gs:
            gdocs[g].add(i)
    for i, gs in per_doc.items():
        if not gs:
            assert i not in got  # too short for any 2-gram
            continue
        dup = sum(1 for g in gs if len(gdocs[g]) >= 2)
        assert got[i]["n_grams"] == len(gs)
        assert got[i]["n_dup_grams"] == dup
        assert abs(got[i]["dup_frac"] - dup / len(gs)) < 1e-12
