"""Skew mitigation: salted join.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized shuffle partitions, but it only engages
for sort-merge joins and only per-partition. Salting is the explicit,
planner-independent form: spread each hot key across B sub-keys on the
big side, replicate the small side B times, join on (key, salt). The
shuffle then has no partition larger than ~1/B of the hot key — the
difference between one straggler task holding 10% of 100 TB and B
even tasks.

Cost model: the replicated side grows B-fold, so salting pays off when
(small side × B) << (hot-key volume / B) — i.e. for dimension-vs-fact
skew, not for two skewed facts (there, pre-aggregate or isolate hot keys
into a broadcast branch instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the LEFT (big, possibly skewed) side salted into
    ``buckets`` sub-keys and the RIGHT (small) side replicated once per
    bucket. Result rows are identical to the plain join (verified by
    oracle); only the shuffle layout changes.

    The salt hashes all left columns — deterministic, no RNG — which
    spreads a hot key as long as its rows differ somewhere (true for any
    fact table with a unique id). Fully identical duplicate rows land in
    one bucket; that skew is irreducible by salting anyway (pre-aggregate
    instead).

    Only left-preserving joins are supported: with ``right`` or
    ``full_outer``, an unmatched right row would surface once per salt
    bucket (the right side is replicated before the join), silently
    duplicating null-extended rows. Salt the other side instead.
    """
    # Normalize Spark's accepted alias spellings (leftouter == left_outer
    # == left, semi == leftsemi == left_semi, ...) before the whitelist
    # check, so every alias of a left-preserving join is accepted.
    norm = how.strip().lower().replace("_", "")
    supported = {"inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"}
    if norm not in supported:
        raise ValueError(
            f"salted_join supports left-preserving joins {sorted(supported)} "
            f"(left side salted, right side replicated {buckets}x); "
            f"how={how!r} would emit unmatched right rows once per salt bucket"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(buckets))
    l_salted = left.withColumn("_salt", salt)
    # MERGE (sort-merge) hint: salting exists for the regime where the
    # dim CANNOT be broadcast — under a broadcast there is no straggler
    # and salting strictly costs (operators/spatial.py, measured). Left
    # to itself Catalyst sizes the replicated side from the PRE-explode
    # parquet stats, decides it fits the broadcast threshold, and then
    # dies building the x-replicated hash table at scale (x64: orders
    # estimated ~40 MB, built 16x = past Spark's 8 GB hard broadcast
    # cap — cannotBroadcastTableOverMaxTableBytesError in the round-8
    # sweep). SHUFFLE_HASH was tried first and blew task execution
    # memory building per-partition hash tables of the replicated side
    # (SparkOutOfMemoryError at x64); sort-merge spills gracefully and
    # is the join AQE's skew splitting engages for — exactly the
    # production regime this operator models.
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).hint("merge")
    cond = (l_salted[left_on] == r_replicated[right_on]) & (
        l_salted["_salt"] == r_replicated["_salt"]
    )
    return l_salted.join(r_replicated, cond, how).drop("_salt")
