"""Deterministic k-means semantics (operators/clustering.py)."""

from __future__ import annotations

from biokg_spark.operators.clustering import kmeans_assign


def _blobs(spark):
    # three well-separated 4-d blobs, 5 points each
    rows = []
    for g, base in enumerate([0.0, 10.0, 20.0]):
        for i in range(5):
            vec = [base + 0.1 * i, base, base - 0.1 * i, base + 0.05]
            rows.append((g * 5 + i, [float(x) for x in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_separated_blobs_cluster_together(spark):
    df = _blobs(spark)
    got = {r.vec_id: r.cluster for r in kmeans_assign(df, k=3, iterations=3).collect()}
    assert len(got) == 15
    groups = [{got[g * 5 + i] for i in range(5)} for g in range(3)]
    # each blob is internally consistent and blobs are mutually distinct
    assert all(len(s) == 1 for s in groups)
    assert len({next(iter(s)) for s in groups}) == 3


def test_assignment_partitioning_stable(spark):
    df = _blobs(spark)
    one = sorted(
        (r.vec_id, r.cluster, r.dist_u6)
        for r in kmeans_assign(df, k=3, iterations=2).collect()
    )
    two = sorted(
        (r.vec_id, r.cluster, r.dist_u6)
        for r in kmeans_assign(df.repartition(7), k=3, iterations=2).collect()
    )
    assert one == two


def test_member_closer_to_own_centroid_after_convergence(spark):
    df = _blobs(spark)
    rows = kmeans_assign(df, k=3, iterations=3).collect()
    # converged on separated blobs: intra-blob distance is tiny
    assert all(r.dist_u6 < 1_000_000 for r in rows)  # < 1.0 squared L2
