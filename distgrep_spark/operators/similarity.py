"""Similarity search over embedding columns (north-star extensions).

Two paths:

- ``cosine_topk`` — brute force: broadcast the (small) query set against
  the corpus, score with built-in higher-order functions (zip_with +
  aggregate — JVM-side, no UDF), rank per query with a window. Exact; the
  baseline the approximate path is measured against. At 100 TB this is a
  single map-side pass over the corpus (queries broadcast), then a
  per-query top-k — the shuffle carries only k·|Q| rows thanks to
  rank-filter pushdown into the window sort.
- ``ann_lsh_topk`` — random-hyperplane LSH: bucket both sides by the sign
  pattern of dot products against H fixed hyperplanes, then score only
  within buckets (optionally ± multi-probe). Recall < 1, cost ~1/2^H of
  brute force per probe. The hyperplanes are derived from a seeded RNG at
  plan-build time and inlined as literals, so results are deterministic
  run-to-run.

All arithmetic is promoted to double BEFORE multiplication (float32
products lose bits and DuckDB's DOUBLE[] oracle computes in double;
double-first makes Spark and DuckDB bit-identical — verified).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` needs (query_id_col, vec_col). Returns
    (query_id, vec_id, cos_sim, rank) with rank 1..k per query, ties
    broken on vec_id so output is deterministic. ``exclude_self`` drops
    corpus rows whose id equals the query id BEFORE ranking (so rank 1 is
    the nearest *other* vector)."""
    c = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col), as_double(F.col(vec_col)).alias("_qv")
    )
    scored = c.crossJoin(broadcast(q)).select(
        query_id_col,
        id_col,
        cosine(F.col("_cv"), F.col("_qv")).alias("cos_sim"),
    )
    if exclude_self:
        scored = scored.where(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.select(
        query_id_col, id_col, "cos_sim", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)


def _hyperplanes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (xorshift-free: a simple
    seeded LCG is enough for LSH bucketing and keeps this dependency-free)."""
    state = seed & 0x7FFFFFFF or 1
    planes: list[list[float]] = []
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append(state / float(1 << 31) - 0.5)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id (one bit per hyperplane) as a long."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(p) for p in plane]))
        bucket = bucket + F.when(d > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def _table_buckets(vec: Column, tables: list[list[list[float]]]) -> Column:
    """Array of (table, bucket) structs — one LSH bucket per hash table."""
    return F.array(
        *[
            F.struct(F.lit(t).alias("table"), lsh_bucket(vec, planes).alias("bucket"))
            for t, planes in enumerate(tables)
        ]
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    dim: int = 64,
    num_planes: int = 4,
    num_tables: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k: score only candidates that share an LSH bucket
    with the query in at least one of ``num_tables`` hash tables.

    Multi-table (L tables × H hyperplanes) is the knob for weak-signal
    corpora: per-table collision for a pair at angle θ is (1-θ/π)^H, and
    L tables union to 1-(1-p^H)^L — more tables buys recall, more planes
    buys selectivity. At 100 TB the corpus's (table, bucket) index is
    written bucketed once (the explode is map-side, no shuffle), queries
    broadcast, and the scored candidate set is ~|corpus|·(1-(1-2^-H)^L)
    per query instead of |corpus|. Hyperplanes come from a seeded LCG at
    plan time → fully deterministic, no RNG at runtime."""
    tables = [
        _hyperplanes(dim, num_planes, seed + 7919 * t) for t in range(num_tables)
    ]
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("_cv")).select(
        id_col, "_cv", F.explode(_table_buckets(F.col("_cv"), tables)).alias("tb")
    )
    q = queries.select(
        F.col(query_id_col), as_double(F.col(vec_col)).alias("_qv")
    ).select(
        query_id_col, "_qv", F.explode(_table_buckets(F.col("_qv"), tables)).alias("tb")
    )
    cand = (
        c.join(broadcast(q), "tb")
        .select(query_id_col, id_col, "_cv", "_qv")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(
        query_id_col,
        id_col,
        cosine(F.col("_cv"), F.col("_qv")).alias("cos_sim"),
    )
    if exclude_self:
        scored = scored.where(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.select(
        query_id_col, id_col, "cos_sim", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)
