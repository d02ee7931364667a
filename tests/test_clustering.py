"""k-means + centroids (operators/clustering.py).

The embeddings fixture's label blobs overlap heavily (within-cluster
spread ~5x the centroid separation; even TRUE-centroid assignment only
reaches 41% label accuracy), so label recovery is not a valid oracle
there. k-means semantics are certified on planted, well-separated
clusters instead; the fixture query is covered by the rows-only check.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distgrep_spark.operators.clustering import centroids_by, kmeans


@pytest.fixture(scope="module")
def planted(spark):
    """3 tight clusters at distant corners of R^4, 30 points each."""
    base = {0: [10.0, 0.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0, 0.0], 2: [0.0, 0.0, 10.0, 0.0]}
    rows = []
    for label, c in base.items():
        for i in range(30):
            jitter = [((i * 7 + j * 3) % 5) / 50.0 for j in range(4)]
            rows.append((label * 30 + i, [c[d] + jitter[d] for d in range(4)], label))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_kmeans_recovers_planted_clusters(planted):
    got = {r["vec_id"]: r["cluster"] for r in kmeans(planted, k=3).collect()}
    truth = {r["vec_id"]: r["label"] for r in planted.collect()}
    # clusters must partition exactly along the planted labels (ids may
    # be permuted): same-label pairs together, cross-label pairs apart
    by_label = {}
    for vid, lab in truth.items():
        by_label.setdefault(lab, set()).add(got[vid])
    assert all(len(s) == 1 for s in by_label.values()), by_label
    assert len({s.pop() for s in by_label.values()}) == 3


def test_kmeans_assigns_every_point_once(planted):
    out = kmeans(planted, k=3).collect()
    assert len(out) == 90
    assert len({r["vec_id"] for r in out}) == 90
    assert {r["cluster"] for r in out} <= {0, 1, 2}


def test_kmeans_codebook_bound_raises(planted):
    # the driver-collect guard (r11 verdict ask #7): k*dim above the
    # codebook bound must fail loudly BEFORE any per-round collect, not
    # silently pull an unbounded matrix to the driver each round
    from distgrep_spark.operators.clustering import _MAX_CODEBOOK_CELLS

    too_many = _MAX_CODEBOOK_CELLS // 4 + 1  # dim=4 fixture => k*dim > bound
    with pytest.raises(ValueError, match="driver-collect bound"):
        kmeans(planted, k=too_many)


def test_centroids_by_label_long_form(planted):
    cents = centroids_by(planted, "label").collect()
    assert len(cents) == 3 * 4
    m = {(r["label"], r["dim"]): r["avg_val"] for r in cents}
    # dominant coordinate of each planted cluster survives averaging
    assert m[(0, 0)] > 9.5 and m[(1, 1)] > 9.5 and m[(2, 2)] > 9.5
    assert m[(0, 1)] < 1.0
