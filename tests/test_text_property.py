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


# ---------------------------------------------------------------------------
# Content-defined chunking (operators/text.cdc_chunk_hashes)
# ---------------------------------------------------------------------------

import hashlib


def _cdc_reference(tokens):
    """Driver-side reference: boundary at pos i (1-based, i >= 3) when
    md5('t[i-2] t[i-1] t[i]') first hex digit < '2'; a boundary STARTS
    counting a new chunk id at its own position (running sum includes
    the current row). Returns the list of chunk token-tuples."""
    chunks, cur = [], []
    idx = 0
    for i, tok in enumerate(tokens, start=1):
        b = 0
        if i >= 3:
            h = hashlib.md5(
                f"{tokens[i-3]} {tokens[i-2]} {tok}".encode()
            ).hexdigest()
            b = 1 if h[0] < "2" else 0
        if b and cur:
            chunks.append(tuple(cur))
            cur = []
        cur.append(tok)
        idx += b
    if cur:
        chunks.append(tuple(cur))
    return chunks


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(40)]), min_size=1, max_size=60
        ),
        min_size=1,
        max_size=4,
    )
)
def test_cdc_chunks_match_reference(spark, corpus):
    from distgrep_spark.operators.text import cdc_chunk_hashes

    rows = [(i, " ".join(toks), "s") for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = defaultdict(list)
    for r in cdc_chunk_hashes(df).collect():
        got[r["doc_id"]].append((r["chunk_idx"], r["chunk_hash"], r["n_toks"]))
    for i, toks in enumerate(corpus):
        ref = _cdc_reference(toks)
        mine = sorted(got[i])
        assert len(mine) == len(ref), (toks, mine, ref)
        for (idx, h, n), chunk in zip(mine, ref):
            assert n == len(chunk)
            assert h == hashlib.md5(" ".join(chunk).encode()).hexdigest()


def test_cdc_chunks_resynchronize_after_prefix_edit(spark):
    """The defining CDC property: inserting tokens at the FRONT of a
    document shifts every fixed-width block (zero shared blocks) but
    perturbs content-defined chunks only up to the first boundary,
    after which chunking re-synchronizes and the chunk hashes are
    identical."""
    from distgrep_spark.operators.text import cdc_chunk_hashes

    base = [f"t{(i * 7) % 13}x{(i * 3) % 11}" for i in range(200)]
    edited = ["inserted", "prefix", "tokens"] + base
    df = spark.createDataFrame(
        [(0, " ".join(base), "s"), (1, " ".join(edited), "s")],
        "doc_id long, text string, source string",
    )
    hashes = defaultdict(Counter)
    for r in cdc_chunk_hashes(df).collect():
        hashes[r["doc_id"]][r["chunk_hash"]] += 1
    a, b = hashes[0], hashes[1]
    shared = sum((a & b).values())
    # sanity: the stream actually produced several chunks
    assert sum(a.values()) >= 5
    # all but the first couple of chunks (the edit region) re-sync
    assert shared >= sum(a.values()) - 2, (a, b)
    # fixed-width 8-token blocking shares NO blocks under the same edit
    fixed_a = Counter(tuple(base[i : i + 8]) for i in range(0, len(base), 8))
    fixed_b = Counter(tuple(edited[i : i + 8]) for i in range(0, len(edited), 8))
    assert sum((fixed_a & fixed_b).values()) == 0
