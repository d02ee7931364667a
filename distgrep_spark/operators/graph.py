"""Connected components — the iterative-algorithm class (and the step
that turns near-dup PAIRS into dedup CLUSTERS: keep min-id per
component, drop the rest).

Min-label propagation: every vertex starts labeled with its own id; each
round it takes the min of its label and its neighbors' labels; fixpoint
= every vertex labeled with the least id reachable from it (= its
component representative). Deterministic, no RNG.

Scale notes: each round is one join + one groupBy on the edge list —
both shuffle on vertex id, so successive rounds reuse the same
partitioning. Rounds needed = graph diameter; duplicate clusters are
near-cliques (diameter ~1-2), so ``max_iter`` default 15 is generous.
``localCheckpoint`` truncates the lineage each round — without it the
plan doubles per iteration and the driver OOMs planning round ~20 long
before data size matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 15,
) -> DataFrame:
    """(id, comp) for every vertex: comp = min vertex id in its
    component (isolated vertices keep their own id).

    Raises if the propagation hasn't converged after ``max_iter`` rounds
    — silent partial convergence would mislabel components.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    und = und.where(F.col("src") != F.col("dst")).distinct().localCheckpoint()

    labels = vertices.select(F.col(id_col).alias("id"), F.col(id_col).alias("comp"))
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """Cluster assignment from near-dup pairs: every document labeled
    with its component's min doc id (``cluster_rep``). Downstream dedup
    keeps ``doc_id == cluster_rep`` rows only."""
    comps = connected_components(
        df.select(id_col), pairs, id_col=id_col, src_col=pair_a, dst_col=pair_b
    )
    return comps.select(F.col("id").alias(id_col), F.col("comp").alias("cluster_rep"))


def degree_orient(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient canonical undirected edges (u, v) from the lower-(degree,
    id) endpoint to the higher — Schank-Wagner compact-forward
    orientation, the degree-ordered scale path for triangle counting
    (queries/profiling.py graph_triangle_count).

    ``edges``: columns (u, v); ``deg``: columns (node, d). Returns
    (s, t, dt) with (d_s, s) < (d_t, t) lexicographically (dt = d_t,
    kept so wedge consumers can order the two targets without another
    degree join). Every triangle
    {a, b, c} in that total order carries s->t edges a->b, a->c, b->c,
    so the source-keyed wedge join finds it exactly once, and per-source
    wedge work is outdeg^2 <= O(arboricity^2) per vertex — a hub's
    edges all point INTO it, so the hub emits no wedges (the 100-TB
    property; hub soak measured in SCALE.md round 4). Two node-keyed
    equi-joins against the degree table (broadcast at fixture scale,
    linear shuffle joins at 100 TB); no shuffle is added to the
    downstream triangle join, which keys on the source column.

    Reference: massimostanzione/distgrep has no graph operators
    (worker.go:24-43 is grep-only); this is the brief's analytics
    extension surface.
    """
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    # dt (the target's degree) rides along so the wedge join can keep
    # only the order-consistent (y, z) ordering — without it, both
    # orderings of every wedge reach the closing join and the
    # inconsistent half can never match an oriented e3 edge (round-4
    # advice: half the probe work was provably wasted).
    return (
        edges.join(du, "u")
        .join(dv, "v")
        .selectExpr(
            "CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS s",
            "CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS t",
            "CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS dt",
        )
    )
