"""Deduplication operators: exact, hash, n-gram Jaccard, MinHash-LSH,
SimHash (north-star extensions; BASELINE.json).

Scale design notes (the 100 TB view):

- **exact / hash**: one shuffle on the (hashed) content key. Hashing first
  (``dedup_by_hash``) shuffles 16-byte digests instead of document bodies —
  at 100 TB that is the difference between shuffling 100 TB and ~1 TB.
- **n-gram Jaccard**: inverted-index self-join on shingles. The classic
  blow-up is hub shingles (a shingle shared by k docs contributes k² pair
  rows); ``max_df`` prunes shingles above a document-frequency cap before
  the join — standard prefix/frequency filtering. Skewed residual buckets
  are split by AQE skew-join handling.
- **MinHash-LSH**: linear-cost signatures (k hash mins per doc), then a
  band-bucket equi-join — candidate pairs only where a band collides, so
  the quadratic term collapses to per-bucket sizes. All hashing is
  ``xxhash64`` (seeded, deterministic run-to-run); no sampling, no RNG.
- **SimHash**: 64-bit signed-sum sketch; near-dup candidates via band
  equality on fingerprint quarters (any pair within Hamming distance 3
  shares at least one of 4 bands — pigeonhole), verified by exact
  Hamming distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distgrep_spark.functions.textfns import word_ngrams

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: the min-id representative + copy count.

    ``min(id)`` (not ``dropDuplicates``) so the survivor is deterministic —
    dropDuplicates keeps an arbitrary partition-order-dependent row, which
    would be irreproducible run to run."""
    return df.groupBy(text_col).agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies")
    )


def dedup_by_hash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup keyed on md5(text): shuffles digests, not documents."""
    return (
        df.select(id_col, F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard (exact near-dup)
# ---------------------------------------------------------------------------


def shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram rows (id, gram) — the inverted-index input."""
    return (
        df.select(id_col, F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard-similar pairs via shingle inverted index.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard >= threshold. ``max_df`` drops shingles whose document
    frequency exceeds the cap before the self-join (at 100 TB a hub
    shingle with df=10⁶ would otherwise emit 10¹² pair rows; docs whose
    every shingle is a hub can only lose recall, which is the standard,
    documented trade)."""
    g = shingles(df, n=n, text_col=text_col, id_col=id_col)
    if max_df is not None:
        rare = g.groupBy("gram").agg(F.count(F.lit(1)).alias("df")).where(
            F.col("df") <= max_df
        )
        g = g.join(rare.select("gram"), "gram")
    sizes = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    a = g.select(F.col(id_col).alias("doc_a"), "gram")
    b = g.select(F.col(id_col).alias("doc_b"), "gram")
    common = (
        a.join(b, "gram")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        common.join(sizes.select(F.col(id_col).alias("doc_a"), F.col("n_grams").alias("na")), "doc_a")
        .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("n_grams").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("c") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("c"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (approximate near-dup at scale)
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    *,
    n: int = 3,
    num_hashes: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, sig: array<bigint>) — sig[i] = min over shingles of
    xxhash64(seed=i, shingle). One explode + one shuffle (the groupBy);
    the k mins are k codegen'd min-aggregates, not k passes."""
    g = shingles(df, n=n, text_col=text_col, id_col=id_col)
    hashed = g.select(
        id_col, *[F.xxhash64(F.lit(i), F.col("gram")).alias(f"h{i}") for i in range(num_hashes)]
    )
    mins = hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return mins.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    min_est_jaccard: float | None = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    bands=16 × rows=4 over 64 hashes → collision probability
    1-(1-j⁴)¹⁶ (≈0.99 at j=0.8, ≈0.04 at j=0.2). Pairs colliding in ≥1
    band are candidates; ``min_est_jaccard`` then filters on the
    signature-estimated Jaccard (fraction of equal minhashes), so the
    output is (doc_a, doc_b, est_jaccard) without touching raw text
    again — at 100 TB the verify step reads 64 longs per doc, not the
    documents."""
    r = num_hashes // bands
    sigs = minhash_signatures(
        df, n=n, num_hashes=num_hashes, text_col=text_col, id_col=id_col
    )
    banded = sigs.select(
        id_col,
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"), F.slice("sig", b * r + 1, r).alias("key")
                ),
            )
        ).alias("bk"),
    ).select(id_col, "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"), "band", "key")
    b = banded.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = cand.select(
        "doc_a",
        "doc_b",
        (
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
            * F.lit(1.0)
            / F.lit(num_hashes)
        ).alias("est_jaccard"),
    )
    if min_est_jaccard is not None:
        est = est.where(F.col("est_jaccard") >= min_est_jaccard)
    return est


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash as a '0'/'1' bit string.

    Per token: xxhash64 → ±1 per bit; per doc: elementwise sum over
    tokens; fingerprint bit = sign. The 64 per-bit sums are codegen'd
    sum-aggregates over one token explode — a single shuffle keyed on the
    doc id."""
    tok = df.select(
        id_col, F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    )
    h = F.xxhash64("tok")
    bits = tok.select(
        id_col,
        *[
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{i}")
            for i in range(64)
        ],
    )
    sums = bits.groupBy(id_col).agg(*[F.sum(f"b{i}").alias(f"b{i}") for i in range(64)])
    fingerprint = F.concat(
        *[F.when(F.col(f"b{i}") > 0, "1").otherwise("0") for i in range(63, -1, -1)]
    )
    return sums.select(id_col, fingerprint.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    *,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs within Hamming distance ``max_hamming``.

    Banding on 4 fingerprint quarters: any pair at distance ≤3 agrees on
    ≥1 quarter (pigeonhole), so the equi-join on (band, quarter) finds all
    such pairs; the exact Hamming distance then verifies. No quadratic
    pass, no RNG."""
    sh = simhash(df, text_col=text_col, id_col=id_col)
    quarters = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.struct(
                    b.alias("band"), F.substring("simhash", b * 16 + 1, 16).alias("key")
                ),
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = quarters.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "key")
    b = quarters.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "key")
    hamming = F.size(
        F.filter(
            F.zip_with(F.split("sh_a", ""), F.split("sh_b", ""), lambda x, y: x != y),
            lambda v: v,
        )
    )
    return (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
