"""Non-vacuity pins for the vocabulary-sensitive operators (round-9
verdict ask #4): the fixture corpus has 31 distinct tokens at every SF
(CLAUDE.md, measured), so these four operators pass their oracles there
without their DISCRIMINATING machinery ever firing. Each test runs the
OPERATOR on a deterministic rich-vocabulary corpus
(tools/plant_richvocab.build — seeded, Zipf token draws, lang-rotated
vocab slices, BM25 query terms pinned at spread frequency ranks) and
asserts the signal the operator exists to produce, not just rows > 0.
Full DuckDB parity on the same corpus is swept separately
(SPARK_GRAFT_ORACLE_SF_DIR=/tmp/richvocab, SCALE.md round-10 entry)."""

from __future__ import annotations

import pytest

import distgrep_spark.queries as q
from tools.plant_richvocab import build


@pytest.fixture(scope="module")
def rich_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("richvocab")
    return build(
        str(out / "corpus"),
        "/root/testdata/sf0.001",
        n_docs=600,
        n_vocab=1024,
    )


def test_bpe_merge_candidates_are_nonuniform(spark, rich_dir):
    """The merge ranking must DISCRIMINATE: 20 candidates exist (the 31-
    token fixture caps the pair table at 31x31 and makes every rank
    boundary fragile), counts strictly descend somewhere (top1 > top20 —
    a flat table means the 'next merge' choice is arbitrary), and the
    winning pair occurs more than once (a real fusion candidate)."""
    rows = {
        r["merge_rank"]: r
        for r in q.QUERIES["text_bpe_merge_step"](spark, rich_dir).collect()
    }
    assert len(rows) == 20
    assert rows[1]["n"] > rows[20]["n"], "flat pair counts: ranking vacuous"
    assert rows[1]["n"] >= 2


def test_vocab_oov_cut_partitions_every_source(spark, rich_dir):
    """The top-K vocabulary cut must BITE on both sides for every
    source: 0 < oov_rate < 1 (on the fixture this only holds because
    K=16 < 31; at any production-shaped vocabulary the rich corpus
    keeps it true structurally)."""
    rows = q.QUERIES["text_vocab_oov_rate"](spark, rich_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 < r["oov_tokens"] < r["total_tokens"], r
        assert 0.0 < r["oov_rate"] < 1.0, r


def test_bm25_scores_discriminate_within_each_query(spark, rich_dir):
    """BM25's ranking must carry idf signal: both fixed queries return a
    full top-10 and the scores within a query are NOT constant (the
    planted corpus pins the query terms at frequency ranks spread by
    orders of magnitude, so tf/dl/idf variation must show up)."""
    rows = q.QUERIES["text_bm25_topk"](spark, rich_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["score"])
    assert set(by_q) == {0, 1}
    for qid, scores in by_q.items():
        assert len(scores) == 10
        assert max(scores) > min(scores), f"query {qid}: constant scores"


def _reference_bpe(texts: dict[int, str], k: int = 4):
    """Plain-Python reference BPE applier: train the top-k (count DESC,
    pair ASC) adjacent-pair table with a != b from one pass, then for
    each rank fuse all left-to-right non-overlapping occurrences."""
    from collections import Counter

    toks = {d: t.split() for d, t in texts.items()}
    pairs = Counter()
    for t in toks.values():
        for x, y in zip(t, t[1:]):
            if x != y:
                pairs[(x, y)] += 1
    merges = sorted(pairs, key=lambda p: (-pairs[p], p))[:k]
    for a, b in merges:
        fused = f"{a}+{b}"
        for d, t in toks.items():
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(fused)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[d] = out
    return toks


def test_bpe_encode_matches_reference_python_bpe(spark, rich_dir):
    """Ask #5's 'Done =': the encode kernel's full per-doc sequences
    (pinned by encoded_md5) must equal a reference Python BPE applier on
    the rich corpus, and the merges must actually FIRE (the fixture's
    31-token corpus can't certify a 4096-token merge table)."""
    import hashlib

    import duckdb

    texts = dict(
        duckdb.connect().execute(
            f"SELECT doc_id, trim(text) FROM "
            f"'{rich_dir}/documents.parquet/*.parquet'"
        ).fetchall()
    )
    expect = _reference_bpe(texts)
    rows = q.QUERIES["text_bpe_encode"](spark, rich_dir).collect()
    assert len(rows) == len(texts)
    merged_docs = 0
    for r in rows:
        ref = expect[r["doc_id"]]
        assert r["n_encoded"] == len(ref), r["doc_id"]
        assert r["n_merged"] == r["n_raw"] - len(ref)
        ref_md5 = hashlib.md5(" ".join(ref).encode()).hexdigest()
        assert r["encoded_md5"] == ref_md5, r["doc_id"]
        merged_docs += r["n_merged"] > 0
    assert merged_docs > 0, "no merge ever fired: encode kernel vacuous"


def _reference_bpe_train(texts: dict[int, str], k: int = 4):
    """Reference k-round BPE TRAINER: each round counts adjacent pairs
    (a != b) over the corpus as merged so far, fuses the (count DESC,
    pair ASC) argmax everywhere left-to-right, repeats."""
    from collections import Counter

    toks = {d: t.split() for d, t in texts.items()}
    out = []
    for r in range(1, k + 1):
        pairs = Counter()
        for t in toks.values():
            for x, y in zip(t, t[1:]):
                if x != y:
                    pairs[(x, y)] += 1
        if not pairs:
            break
        a, b = min(pairs, key=lambda p: (-pairs[p], p))
        out.append((r, a, b, pairs[(a, b)]))
        fused = f"{a}+{b}"
        for d, t in toks.items():
            new, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    new.append(fused)
                    i += 2
                else:
                    new.append(t[i])
                    i += 1
            toks[d] = new
    return out


def test_bpe_train_loop_matches_reference_and_learns_fused_symbols(
    spark, rich_dir
):
    """The k-round trainer must equal the reference trainer exactly
    (rank, pair, count at selection time) — and on a corpus this rich
    the loop's defining property must FIRE: at least one later merge
    selects a symbol fused by an earlier round (a static single-pass
    pair count, text_bpe_merge_step's shape, can never produce that)."""
    import duckdb

    texts = dict(
        duckdb.connect().execute(
            f"SELECT doc_id, trim(text) FROM "
            f"'{rich_dir}/documents.parquet/*.parquet'"
        ).fetchall()
    )
    expect = _reference_bpe_train(texts)
    rows = sorted(
        (r["merge_rank"], r["pair_a"], r["pair_b"], r["n"])
        for r in q.QUERIES["text_bpe_train_k"](spark, rich_dir).collect()
    )
    assert rows == expect
    fused_inputs = [
        (rank, a, b) for rank, a, b, _ in rows if "+" in a or "+" in b
    ]
    assert fused_inputs, (
        "no merge ever consumed a fused symbol: the loop is "
        "indistinguishable from a static pair count on this corpus"
    )


def test_tokenizer_mixture_pipeline_selection_discriminates(spark, rich_dir):
    """The flagship's budget selection must BITE: with a 60% budget and
    sqrt-temperature weights, at least one source is truncated
    (0 < kept_docs < n_docs), no source exceeds its allocation
    (kept_tokens <= alloc_tokens), every kept count is consistent, and
    the weights differ across sources (the mixture is not uniform)."""
    rows = q.QUERIES["tokenizer_mixture_pipeline"](spark, rich_dir).collect()
    assert len(rows) == 8
    weights = {r["weight"] for r in rows}
    assert len(weights) > 1, "uniform weights: temperature mixture vacuous"
    truncated = 0
    for r in rows:
        assert r["kept_tokens"] <= r["alloc_tokens"], r
        assert 0 <= r["kept_docs"] <= r["n_docs"], r
        if 0 < r["kept_docs"] < r["n_docs"]:
            truncated += 1
        if r["alloc_tokens"] > 0:
            assert 0.0 <= r["fill_rate"] <= 1.0, r
    assert truncated > 0, "no source truncated: the budget never bound"


def test_dsir_importance_prefers_target_language(spark, rich_dir):
    """DSIR's whole point: the top-100 selection must be ENRICHED in the
    target ('en') slice relative to its corpus share (60%), and the
    scores must spread. The lang-rotated vocabulary slices make
    en-trigrams genuinely more target-like, so a correct importance
    ratio concentrates them; a vacuous score (all-equal ratios) would
    select ~at the corpus rate."""
    rows = q.QUERIES["text_dsir_importance"](spark, rich_dir).collect()
    assert len(rows) == 100
    scores = [r["score_num"] for r in rows]
    assert max(scores) > min(scores), "constant importance scores"
    en_frac = sum(1 for r in rows if r["lang"] == "en") / len(rows)
    assert en_frac > 0.70, f"top-100 en fraction {en_frac} not enriched vs 0.60"


def test_bpe_encode_arrow_deep_matches_reference_at_k1024(spark, rich_dir):
    """Round-11 ask #1's 'Done =': the bounded-plan Arrow kernel
    (operators/bpe.bpe_encode_arrow — ONE mapInPandas pass, broadcast
    merge table, plan constant in k) must reproduce the Python
    reference applier at PRODUCTION depth (k=1024) on the rich corpus,
    md5-pinned per document — and depth must BITE (k=1024 merges
    strictly more than the k=4 chained-kernel demo)."""
    import hashlib

    import duckdb

    from distgrep_spark.functions.textfns import tokens
    from distgrep_spark.operators.bpe import bpe_encode_arrow
    from distgrep_spark.queries.llm import _bpe_top_merges
    from distgrep_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    texts = dict(
        duckdb.connect().execute(
            f"SELECT doc_id, trim(text) FROM "
            f"'{rich_dir}/documents.parquet/*.parquet'"
        ).fetchall()
    )
    K = 1024
    expect = _reference_bpe(texts, k=K)
    toks = load_table(spark, rich_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    merges = [(r["a"], r["b"]) for r in _bpe_top_merges(toks, K)]
    assert len(merges) >= 512, f"rich corpus too poor for a deep table: {len(merges)}"
    rows = bpe_encode_arrow(toks, merges).collect()
    assert len(rows) == len(texts)
    deep_merged = 0
    for r in rows:
        ref = expect[r["doc_id"]]
        assert r["n_encoded"] == len(ref), r["doc_id"]
        ref_md5 = hashlib.md5(" ".join(ref).encode()).hexdigest()
        assert r["encoded_md5"] == ref_md5, r["doc_id"]
        deep_merged += r["n_merged"]
    shallow = _reference_bpe(texts, k=4)
    shallow_merged = sum(
        len(texts[d].split()) - len(t) for d, t in shallow.items()
    )
    assert deep_merged > shallow_merged > 0, (deep_merged, shallow_merged)


def test_bpe_encode_deep_registry_equals_chained_semantics(spark, rich_dir):
    """The registered deep entry and the chained-projection kernel share
    ONE contract (one-pass-per-rank): truncating the deep table to the
    chained kernel's k=4 must reproduce text_bpe_encode byte-for-byte."""
    from distgrep_spark.functions.textfns import tokens
    from distgrep_spark.operators.bpe import bpe_encode_arrow
    from distgrep_spark.queries.llm import _bpe_top_merges
    from distgrep_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    toks = load_table(spark, rich_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    merges = [(r["a"], r["b"]) for r in _bpe_top_merges(toks, 4)]
    arrow = {
        r["doc_id"]: (r["n_raw"], r["n_encoded"], r["encoded_md5"])
        for r in bpe_encode_arrow(toks, merges).collect()
    }
    chained = {
        r["doc_id"]: (r["n_raw"], r["n_encoded"], r["encoded_md5"])
        for r in q.QUERIES["text_bpe_encode"](spark, rich_dir).collect()
    }
    assert arrow == chained


def test_bpe_encode_tokens_never_revisits_earlier_ranks():
    """Pure-unit pin of the one-pass-per-rank contract (the semantics
    the SQL twins unroll): a pair whose rank already passed is NOT
    re-enabled by a later merge that creates a new occurrence of it."""
    from distgrep_spark.operators.bpe import encode_tokens

    # rank 0 applies first and creates no (c, a+b) yet; rank 1 then
    # fires on the fused symbol -> forward chaining WORKS
    merges = [("a", "b"), ("c", "a+b")]
    pr = {p: i for i, p in enumerate(merges)}
    assert encode_tokens(["c", "a", "b"], pr, merges) == ["c+a+b"]
    # reversed ranks: (a, b) fires at rank 1, but (c, a+b) — rank 0 —
    # is already past and must NOT fire on the newly fused symbol
    merges2 = [("c", "a+b"), ("a", "b")]
    pr2 = {p: i for i, p in enumerate(merges2)}
    assert encode_tokens(["c", "a", "b"], pr2, merges2) == ["c", "a+b"]
    # non-overlap under a != b: [a, b, b] fuses only the first pair
    merges3 = [("a", "b")]
    pr3 = {p: i for i, p in enumerate(merges3)}
    assert encode_tokens(["a", "b", "b"], pr3, merges3) == ["a+b", "b"]


def _reference_probe(texts: dict[int, tuple[str, str]], epochs: int = 3):
    """Plain-Python reference for the linear-probe trainer
    (operators/linearprobe.py): same md5 bucket decode, same integer
    micro grid, same floor-divided full-batch GD update — every value
    a Python int, so equality with the engine is exact or nothing."""
    import hashlib

    n = len(texts)
    docs = []
    for _, (t, lang) in sorted(texts.items()):
        bs = {
            int(hashlib.md5(tok.encode()).hexdigest()[:2], 16)
            for tok in t.split()
        }
        docs.append((1 if lang == "en" else 0, bs))
    w = [0] * 256
    traj = []
    for _ in range(epochs):
        g = [0] * 256
        for y, bs in docs:
            resid = y * 1_000_000 - sum(w[b] for b in bs)
            for b in bs:
                g[b] += resid
        w = [w[j] + g[j] // (1024 * n) for j in range(256)]
        traj.append(list(w))
    return docs, traj


def test_quality_train_probe_matches_reference_trainer(spark, rich_dir):
    """Round-11 ask #4's 'Done =': the distributed trainer's whole
    weight trajectory (3 full-batch GD epochs on the integer micro
    grid) equals the plain-Python reference exactly, per bucket."""
    import duckdb

    texts = {
        d: (t, lang)
        for d, t, lang in duckdb.connect().execute(
            f"SELECT doc_id, trim(text), lang FROM"
            f" '{rich_dir}/documents.parquet/*.parquet'"
        ).fetchall()
    }
    docs, traj = _reference_probe(texts, epochs=3)
    rows = {
        r["bucket"]: r
        for r in q.QUERIES["text_quality_train_probe"](spark, rich_dir).collect()
    }
    live = {b for _, bs in docs for b in bs}
    assert set(rows) == live
    for b, r in rows.items():
        assert r["n_docs"] == sum(1 for _, bs in docs if b in bs), b
        assert r["n_pos"] == sum(y for y, bs in docs if b in bs), b
        assert (r["w1_micros"], r["w2_micros"], r["w3_micros"]) == (
            traj[0][b],
            traj[1][b],
            traj[2][b],
        ), b
    # buckets outside the live set never receive gradient: W stays 0
    for b in set(range(256)) - live:
        assert traj[2][b] == 0


def test_quality_train_probe_trains_nonvacuously(spark, rich_dir):
    """The trainer must TRAIN, not just hash-match: weights move off
    zero and keep moving in epoch 3, the measured |W| stays far inside
    the shift-trick margin documented in operators/linearprobe.py, the
    exact training loss strictly decreases every epoch, and the
    learned table separates en from non-en documents (the signal the
    fixed Knuth-spread inference weights cannot carry)."""
    import duckdb

    texts = {
        d: (t, lang)
        for d, t, lang in duckdb.connect().execute(
            f"SELECT doc_id, trim(text), lang FROM"
            f" '{rich_dir}/documents.parquet/*.parquet'"
        ).fetchall()
    }
    docs, traj = _reference_probe(texts, epochs=3)
    assert max(abs(v) for v in traj[2]) > 0, "trainer never moved"
    assert traj[2] != traj[1], "epoch 3 was a no-op"
    # measured bound backing the MICRO shift margin (|W| << 1e6)
    assert max(abs(v) for v in traj[2]) < 10_000

    def sse(w):
        return sum(
            (y * 1_000_000 - sum(w[b] for b in bs)) ** 2 for y, bs in docs
        )

    losses = [sse([0] * 256)] + [sse(w) for w in traj]
    for before, after in zip(losses, losses[1:]):
        assert after < before, f"loss did not decrease: {losses}"
    w3 = traj[2]
    en = [sum(w3[b] for b in bs) for y, bs in docs if y == 1]
    other = [sum(w3[b] for b in bs) for y, bs in docs if y == 0]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other), (
        "learned weights do not separate the label"
    )


def test_quality_filter_pipeline_enriches_target(spark, rich_dir):
    """FLAGSHIP 8 end-to-end pin: per-source funnel counts equal the
    plain-Python train->infer->filter replica exactly, the mean-logit
    cut bites on both sides, and the kept population is en-enriched
    vs the corpus (the filter FILTERS, non-vacuously)."""
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, trim(text), lang, source FROM"
        f" '{rich_dir}/documents.parquet/*.parquet'"
    ).fetchall()
    texts = {d: (t, lang) for d, t, lang, _ in rows}
    source_of = {d: s for d, _, _, s in rows}
    docs, traj = _reference_probe(texts, epochs=3)
    w3 = traj[2]
    ids = sorted(texts)
    logits = {
        d: sum(w3[b] for b in bs) for d, (_, bs) in zip(ids, docs)
    }
    n = len(ids)
    s = sum(logits.values())
    expect: dict[str, list[int]] = {}
    for d, (y, _) in zip(ids, docs):
        kept = 1 if logits[d] * n > s else 0
        e = expect.setdefault(source_of[d], [0, 0, 0, 0])
        e[0] += 1
        e[1] += y
        e[2] += kept
        e[3] += y * kept
    got = {
        r["source"]: [r["n_docs"], r["n_en"], r["n_kept"], r["n_kept_en"]]
        for r in q.QUERIES["quality_filter_pipeline"](spark, rich_dir).collect()
    }
    assert got == expect
    n_kept = sum(v[2] for v in got.values())
    n_en = sum(v[1] for v in got.values())
    n_kept_en = sum(v[3] for v in got.values())
    assert 0 < n_kept < n, "mean-logit cut did not bite on both sides"
    assert n_kept_en * n > n_en * n_kept, (
        "kept population is not en-enriched: the learned filter is vacuous"
    )


def test_probe_trainer_properties_hold_on_random_corpora():
    """Hypothesis sweep of the trainer CONTRACT's exact math
    (operators/linearprobe.py) on random small corpora:
    - document-ORDER invariance: the full-batch trajectory is a pure
      function of the document multiset (the property that justifies
      full-batch over SGD — SGD has none of this);
    - duplication invariance: copying the whole corpus m times leaves
      every epoch's weights identical (floor(m*g/(1024*m*N)) ==
      floor(g/(1024*N)) — the trained table depends on the
      distribution, not the count: resharding/densification never
      moves a weight);
    - the stability envelope: |dW_r| <= (1e6 + 256*max|W_{r-1}|)/1024
      + 1 micros, the induction that backs the shift-trick margin.
    Universal loss-decrease is deliberately NOT asserted here: a
    floored step can overshoot an ideal sub-micro update; the
    decrease claim is pinned where it belongs, on the real corpus
    (test_quality_train_probe_trains_nonvacuously)."""
    from hypothesis import given, settings, strategies as st

    tok = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
    doc = st.tuples(
        st.lists(tok, min_size=1, max_size=8),
        st.sampled_from(["en", "fr"]),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=12), st.integers(2, 3))
    def check(docs, m):
        base = {
            i: (" ".join(toks), lang) for i, (toks, lang) in enumerate(docs)
        }
        _, traj = _reference_probe(base, epochs=3)
        # order invariance: reversed id assignment, same multiset
        rev = {
            i: (" ".join(toks), lang)
            for i, (toks, lang) in enumerate(reversed(docs))
        }
        _, traj_rev = _reference_probe(rev, epochs=3)
        assert traj == traj_rev
        # duplication invariance: m copies of every document
        dup = {
            k * len(docs) + i: (" ".join(toks), lang)
            for k in range(m)
            for i, (toks, lang) in enumerate(docs)
        }
        _, traj_dup = _reference_probe(dup, epochs=3)
        assert traj == traj_dup
        # stability envelope per epoch
        prev = [0] * 256
        for w in traj:
            cap = (1_000_000 + 256 * max(abs(v) for v in prev)) // 1024 + 1
            assert all(abs(a - b) <= cap for a, b in zip(w, prev))
            prev = w

    check()


def test_loso_influence_matches_filtered_reference(spark, rich_dir):
    """quality_probe_loso_influence vs the plain-Python trainer run
    once per held-out source: every reported summary (L1 shift,
    buckets moved, sign flips, docs held) must equal the reference
    computed from full-vs-filtered trajectories exactly, and the
    influence signal must be non-vacuous (every source moves the
    model; shifts are not all equal)."""
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, trim(text), lang, source FROM"
        f" '{rich_dir}/documents.parquet/*.parquet'"
    ).fetchall()
    full_texts = {d: (t, lang) for d, t, lang, _ in rows}
    _, full_traj = _reference_probe(full_texts, epochs=3)
    wf = full_traj[2]
    expect = {}
    for s in sorted({src for _, _, _, src in rows}):
        sub = {d: (t, lang) for d, t, lang, src in rows if src != s}
        _, traj = _reference_probe(sub, epochs=3)
        wh = traj[2]
        expect[s] = (
            len(full_texts) - len(sub),
            sum(abs(a - b) for a, b in zip(wf, wh)),
            sum(1 for a, b in zip(wf, wh) if a != b),
            sum(1 for a, b in zip(wf, wh) if (a > 0) != (b > 0)),
        )
    got = {
        r["heldout_source"]: (
            r["n_docs_held"],
            r["l1_shift_micros"],
            r["n_buckets_moved"],
            r["n_sign_flips"],
        )
        for r in q.QUERIES["quality_probe_loso_influence"](
            spark, rich_dir
        ).collect()
    }
    assert got == expect
    shifts = [v[1] for v in got.values()]
    assert all(s > 0 for s in shifts), "a source moved nothing: vacuous"
    assert len(set(shifts)) > 1, "all sources equally influential: vacuous"
