"""PageRank power-iteration semantics (operators/pagerank.py)."""

from __future__ import annotations

import numpy as np

from biokg_spark.operators.pagerank import pagerank


def _numpy_pagerank(edges, damping, iters):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[ix[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        for s, d in edges:
            nxt[ix[d]] += damping * r[ix[s]] / deg[ix[s]]
        r = nxt
    return {v: r[ix[v]] for v in nodes}


def _spark_pagerank(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.id: r.rank for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_numpy_directed_with_dangling(spark):
    # 'd' is dangling (no out-edges): its mass leaks, per the simplified
    # variant the docstring pins
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
    ]
    want = _numpy_pagerank(edges, 0.85, 10)
    got = _spark_pagerank(spark, edges, damping=0.85, iters=10)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_pagerank_uniform_on_symmetric_cycle(spark):
    # symmetric ring: every node identical rank = 1/N at every iteration
    ring = [("a", "b"), ("b", "c"), ("c", "a"),
            ("b", "a"), ("c", "b"), ("a", "c")]
    got = _spark_pagerank(spark, ring, damping=0.85, iters=7)
    for v, r in got.items():
        assert abs(r - 1.0 / 3) < 1e-12, (v, r)


def test_pagerank_random_graphs_vs_numpy(spark):
    import random

    for seed in range(3):
        rng = random.Random(100 + seed)
        nodes = [f"v{i}" for i in range(8)]
        edges = [
            (a, b)
            for a in nodes
            for b in nodes
            if a != b and rng.random() < 0.3
        ]
        if not edges:
            continue
        want = _numpy_pagerank(edges, 0.85, 8)
        got = _spark_pagerank(spark, edges, damping=0.85, iters=8)
        assert set(got) == set(want), f"seed={seed}"
        for v in want:
            assert abs(got[v] - want[v]) < 1e-9, (seed, v)


def test_pagerank_checkpoint_interval_invariant(spark):
    # lineage-truncation cadence must not change values
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")]
    r1 = _spark_pagerank(spark, edges, iters=6, checkpoint_every=2)
    r2 = _spark_pagerank(spark, edges, iters=6, checkpoint_every=100)
    assert r1 == r2
