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


def _hits_reference(edges, iters):
    """Row-at-a-time HITS ground truth (same recurrence/normalization)."""
    import math

    es = sorted(set(edges))
    nodes = sorted({n for e in es for n in e})
    h = {n: 1.0 for n in nodes}
    a = {}
    for _ in range(iters):
        a = {n: 0.0 for n in nodes}
        for s, d in es:
            a[d] += h[s]
        norm = math.sqrt(sum(v * v for v in a.values()))
        a = {n: v / norm for n, v in a.items()}
        h = {n: 0.0 for n in nodes}
        for s, d in es:
            h[s] += a[d]
        norm = math.sqrt(sum(v * v for v in h.values()))
        h = {n: v / norm for n, v in h.items()}
    return h, a


def test_hits_star_hub_vs_authority(spark):
    from biokg_spark.operators.pagerank import hits

    # h points at 3 leaves: h is the pure hub, leaves pure authorities
    edges = [("h", "x"), ("h", "y"), ("h", "z")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.id: (round(r.hub, 6), round(r.auth, 6)) for r in hits(df).collect()}
    assert got["h"][0] == 1.0 and got["h"][1] == 0.0
    for leaf in "xyz":
        assert got[leaf][0] == 0.0
        assert abs(got[leaf][1] - 1 / 3**0.5) < 1e-6


def test_hits_matches_reference_on_random_digraphs(spark):
    import random

    from biokg_spark.operators.pagerank import hits

    for seed in (7, 8):
        rng = random.Random(seed)
        nodes = [f"v{i}" for i in range(8)]
        edges = list(
            {
                (rng.choice(nodes), rng.choice(nodes))
                for _ in range(20)
            }
        )
        edges = [(s, d) for s, d in edges if s != d]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.id: (r.hub, r.auth) for r in hits(df, iters=6).collect()}
        h, a = _hits_reference(edges, iters=6)
        for n in h:
            assert abs(got[n][0] - h[n]) < 1e-9, (seed, n)
            assert abs(got[n][1] - a[n]) < 1e-9, (seed, n)


def _numpy_ppr(edges, seeds, damping, iters):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    p = np.zeros(n)
    for s in seeds:
        p[ix[s]] = 1.0 / len(seeds)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[ix[s]] += 1
    r = p.copy()
    for _ in range(iters):
        nxt = (1.0 - damping) * p
        for s, d in edges:
            nxt[ix[d]] += damping * r[ix[s]] / deg[ix[s]]
        r = nxt
    return {v: r[ix[v]] for v in nodes}


def _spark_ppr(spark, edges, seeds, **kw):
    from biokg_spark.operators.pagerank import personalized_pagerank

    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "id string")
    return {r.id: r.rank for r in personalized_pagerank(e, s, **kw).collect()}


def test_ppr_matches_numpy_and_emits_unreachable_as_zero(spark):
    # 'z' has no path from the seed 'a': rank must be EXACTLY 0 and the
    # row must still be emitted (the oracle sees the full node universe)
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("z", "a")]
    want = _numpy_ppr(edges, ["a"], 0.85, 10)
    got = _spark_ppr(spark, edges, ["a"], damping=0.85, iters=10)
    assert set(got) == set(want)
    assert got["z"] == 0.0
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_ppr_restart_mass_splits_across_seeds(spark):
    # two isolated 2-cycles, one seed in each: by symmetry each
    # component holds exactly half the stationary-ish mass at every
    # fixed iteration count
    edges = [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")]
    got = _spark_ppr(spark, edges, ["a", "x"], damping=0.85, iters=9)
    assert abs(got["a"] - got["x"]) < 1e-12
    assert abs(got["b"] - got["y"]) < 1e-12
    assert (
        abs(got["a"] + got["b"] - got["x"] - got["y"]) < 1e-12
    )


def test_ppr_random_graphs_vs_numpy(spark):
    import random

    for seed in (31, 32):
        rng = random.Random(seed)
        nodes = [f"v{i}" for i in range(9)]
        edges = sorted(
            {(rng.choice(nodes), rng.choice(nodes)) for _ in range(22)}
        )
        edges = [(s, d) for s, d in edges if s != d]
        seeds = sorted({rng.choice(nodes) for _ in range(3)})
        want = _numpy_ppr(edges, seeds, 0.85, 8)
        got = _spark_ppr(spark, edges, seeds, damping=0.85, iters=8)
        for v in want:
            assert abs(got[v] - want[v]) < 1e-9, (seed, v)
