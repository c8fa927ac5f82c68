"""Graph profile semantics (operators/graphstats.py)."""

from __future__ import annotations

from itertools import combinations

from biokg_spark.operators.graphstats import graph_profile


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return graph_profile(df, **kw).collect()[0]


def test_k4_profile(spark):
    row = _run(spark, [(u, v) for u, v in combinations("abcd", 2)])
    assert (row.n_nodes, row.n_edges) == (4, 6)
    assert (row.min_deg, row.max_deg, row.avg_deg) == (3, 3, 3.0)
    assert row.p50_deg == row.p99_deg == 3.0


def test_star_profile_dedups_and_drops_loops(spark):
    edges = [("h", f"l{i}") for i in range(9)]
    noisy = edges + [(b, a) for a, b in edges] + [("h", "h")]
    row = _run(spark, noisy)
    assert (row.n_nodes, row.n_edges) == (10, 9)
    assert (row.min_deg, row.max_deg) == (1, 9)
    assert row.p50_deg == 1.0  # leaves dominate


def test_approx_path_matches_on_small_input(spark):
    # the sketch is exact-discrete when n <= accuracy — same numbers
    # apart from interpolation on even counts
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    exact = _run(spark, edges, exact_percentiles=True)
    approx = _run(spark, edges, exact_percentiles=False)
    assert (exact.n_nodes, exact.n_edges) == (approx.n_nodes, approx.n_edges)
    assert approx.max_deg == exact.max_deg == 2
