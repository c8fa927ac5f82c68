"""Triangle counting semantics (operators/triangles.py)."""

from __future__ import annotations

from itertools import combinations

from biokg_spark.operators.triangles import triangle_counts


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.n_triangles for r in triangle_counts(df).collect()}


def test_triangle_plus_square_and_pendant(spark):
    # triangle a-b-c; square c-d-e-f-c (no diagonal => no triangle);
    # pendant g off a; duplicate and reversed edges thrown in
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("c", "d"), ("d", "e"), ("e", "f"), ("f", "c"),
        ("a", "g"),
        ("b", "a"), ("a", "b"),  # reversed + duplicate
        ("a", "a"),  # self-loop dropped
    ]
    got = _run(spark, edges)
    assert got == {"a": 1, "b": 1, "c": 1}


def test_k4_counts(spark):
    # K4: 4 triangles, each node in exactly 3
    edges = [(u, v) for u, v in combinations("abcd", 2)]
    got = _run(spark, edges)
    assert got == {n: 3 for n in "abcd"}


def test_hub_star_has_no_triangles(spark):
    # star around h: many wedges at the leaves' orientation target, zero
    # closures — and the orientation points leaf->hub, so the hub
    # contributes no wedge pairs at all
    edges = [("h", f"l{i}") for i in range(20)]
    assert _run(spark, edges) == {}


def test_random_graphs_vs_bruteforce(spark):
    """Seeded Erdős–Rényi graphs vs itertools brute force — the
    operator's orientation/dedup logic against ground truth."""
    import random

    for seed in range(4):
        rng = random.Random(seed)
        nodes = [f"v{i}" for i in range(9)]
        edges = [
            (a, b) for a, b in combinations(nodes, 2) if rng.random() < 0.45
        ]
        # present each edge in a random direction, some duplicated
        noisy = [
            (b, a) if rng.random() < 0.5 else (a, b) for a, b in edges
        ] + [e for e in edges if rng.random() < 0.3]
        eset = {frozenset(e) for e in edges}
        want: dict[str, int] = {}
        for tri in combinations(nodes, 3):
            if all(frozenset(p) in eset for p in combinations(tri, 2)):
                for n in tri:
                    want[n] = want.get(n, 0) + 1
        assert _run(spark, noisy) == want, f"seed={seed}"


def test_clustering_coefficients(spark):
    from biokg_spark.operators.triangles import clustering_coefficients

    # triangle a-b-c plus pendant d off a: deg(a)=3, T(a)=1 -> 1/3;
    # b,c: deg 2, T 1 -> 1.0; d: deg 1 -> 0
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.node: (r.deg, r.n_triangles, round(r.lcc, 6))
        for r in clustering_coefficients(df).collect()
    }
    assert got == {
        "a": (3, 1, round(1 / 3, 6)),
        "b": (2, 1, 1.0),
        "c": (2, 1, 1.0),
        "d": (1, 0, 0.0),
    }


def test_two_shared_edge_triangles(spark):
    # a-b shared by triangles (a,b,c) and (a,b,d)
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")]
    got = _run(spark, edges)
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}
