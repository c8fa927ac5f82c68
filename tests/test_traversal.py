"""BFS distance semantics (operators/traversal.py) and DSIR scoring
direction (operators/mixture.py::dsir_importance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biokg_spark.operators.traversal import bfs_distances


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


def test_bfs_min_dist_on_cycle_and_diamond(spark):
    # a -> b -> c -> a cycle plus a diamond a->d, b->d: d is reachable at
    # dist 1 (via a) AND dist 2 (via b) — first visit must win.
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("b", "d")],
    )
    got = {
        r.id: r.dist
        for r in bfs_distances(e, _seeds(spark, ["a"]), max_hops=5).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2, "d": 1}


def test_bfs_multi_source_and_hop_bound(spark):
    # chain a->b->c->d->e; seeds {a, e}: everything is within 2 hops of
    # SOME seed even though the chain is length 4.
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = {
        r.id: r.dist
        for r in bfs_distances(
            _edges(spark, chain), _seeds(spark, ["a", "e"]), max_hops=2
        ).collect()
    }
    assert got == {"a": 0, "e": 0, "b": 1, "c": 2}
    # directed: e has no out-edges, so d is NOT within 2 of {a, e}
    assert "d" not in got


def test_bfs_unreachable_absent_and_early_stop(spark):
    # two components; seeds only in the first. max_hops generous — the
    # loop must terminate on the empty frontier, not run 50 rounds.
    e = _edges(spark, [("a", "b"), ("x", "y")])
    got = {
        r.id: r.dist
        for r in bfs_distances(e, _seeds(spark, ["a"]), max_hops=50).collect()
    }
    assert got == {"a": 0, "b": 1}


def test_dsir_scores_prefer_target_lookalikes(spark):
    from biokg_spark.operators.mixture import dsir_importance

    # target slice speaks "alpha beta gamma"; raw noise speaks digits.
    # A raw doc written in target language must outscore a noise doc.
    rows = [
        (0, "t", "alpha beta gamma alpha beta"),
        (1, "t", "beta gamma alpha beta gamma"),
        (2, "r", "alpha beta gamma beta gamma"),  # target lookalike
        (3, "r", "one two three four five"),
        (4, "r", "six seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.doc_id: r.dsir_score
        for r in dsir_importance(
            docs, target=F.col("source") == "t", buckets=64, width=2
        ).collect()
    }
    assert len(got) == 5
    assert got[2] > got[3]
    assert got[2] > got[4]
    # the target docs themselves score at least as high as the lookalike
    assert min(got[0], got[1]) >= got[2]


def test_per_seed_bfs_tracks_each_field_independently(spark):
    from biokg_spark.operators.traversal import bfs_distances_per_seed

    # path a -> b -> c -> d; seeds a and c
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    s = spark.createDataFrame([("a",), ("c",)], "id string")
    got = {
        (r.seed, r.id): r.dist
        for r in bfs_distances_per_seed(e, s, max_hops=4).collect()
    }
    assert got == {
        ("a", "a"): 0, ("a", "b"): 1, ("a", "c"): 2, ("a", "d"): 3,
        ("c", "c"): 0, ("c", "d"): 1,
    }


def test_harmonic_hand_computed_star_and_truncation(spark):
    from biokg_spark.operators.traversal import harmonic_centrality_sampled

    # undirected star: hub h <-> x,y,z  (symmetrized edge list)
    ud = [("h", "x"), ("h", "y"), ("h", "z")]
    e = spark.createDataFrame(
        ud + [(b, a) for a, b in ud], "src string, dst string"
    )
    s = spark.createDataFrame([("x",), ("y",), ("z",)], "id string")
    got = {
        r.id: (r.harmonic, r.n_seeds_reaching)
        for r in harmonic_centrality_sampled(e, s, max_hops=4).collect()
    }
    # hub: 1/1 from each of the 3 seeds; each leaf: 1/2 from the OTHER
    # two seeds only (self at dist 0 contributes nothing)
    assert got["h"] == (3.0, 3)
    for leaf in "xyz":
        assert got[leaf] == (1.0, 2)
    # truncation at 1 hop: leaves no longer reach each other
    t = {
        r.id: (r.harmonic, r.n_seeds_reaching)
        for r in harmonic_centrality_sampled(e, s, max_hops=1).collect()
    }
    assert t == {"h": (3.0, 3)}


def test_skew_profile_counts_share_and_rank(spark):
    from biokg_spark.operators.skew import skew_profile

    rows = [("hot", i) for i in range(6)] + [("warm", 0), ("warm", 1), ("cold", 0)]
    df = spark.createDataFrame(rows, "k string, v int")
    got = {
        (r.key_col, r.key): (r.cnt, r.share, r.skew, r.rank)
        for r in skew_profile(df, ["k", "v"], top_k=2).collect()
    }
    # column k: 9 rows over 3 keys -> mean 3; hot=6 (share 6/9, skew 2)
    assert got[("k", "hot")] == (6, round(6 / 9, 4), 2.0, 1)
    assert got[("k", "warm")] == (2, round(2 / 9, 4), round(2 / 3, 4), 2)
    assert ("k", "cold") not in got  # top_k=2
    # column v: 0 x3, 1 x2, 2..5 x1 -> mean 9/6 = 1.5
    assert got[("v", "0")] == (3, round(3 / 9, 4), 2.0, 1)
    assert got[("v", "1")] == (2, round(2 / 9, 4), round(2 / 1.5, 4), 2)
    assert len(got) == 4


def _sym(spark, pairs):
    from pyspark.sql import functions as F

    e = spark.createDataFrame(pairs, "src string, dst string")
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()


def test_betweenness_path_graph(spark):
    from biokg_spark.operators.traversal import betweenness_sampled

    e = _sym(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    seeds = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "id string")
    got = {
        r.id: (r.betweenness, r.n_seeds)
        for r in betweenness_sampled(e, seeds, max_hops=3).collect()
    }
    # hand-computed Brandes (directed-sum over the symmetrized graph —
    # each unordered pair counts twice): δ totals b=4, c=4; endpoints
    # carry no dependency and are absent
    assert got == {"b": (4.0, 3), "c": (4.0, 3)}


def test_betweenness_star_graph(spark):
    from biokg_spark.operators.traversal import betweenness_sampled

    e = _sym(spark, [("x", "l1"), ("x", "l2"), ("x", "l3")])
    seeds = spark.createDataFrame([("x",), ("l1",), ("l2",), ("l3",)], "id string")
    got = {r.id: r.betweenness for r in betweenness_sampled(e, seeds, max_hops=2).collect()}
    # center sits on every ordered leaf pair: 3x2 = 6
    assert got == {"x": 6.0}


def test_betweenness_hop_truncation(spark):
    from biokg_spark.operators.traversal import betweenness_sampled

    e = _sym(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    seeds = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "id string")
    # max_hops=1: no path long enough to have an interior vertex
    assert betweenness_sampled(e, seeds, max_hops=1).count() == 0
    # max_hops=2 drops the a->d / d->a dependencies: b,c fall to 2 each
    got = {r.id: r.betweenness for r in betweenness_sampled(e, seeds, max_hops=2).collect()}
    assert got == {"b": 2.0, "c": 2.0}


def test_weighted_distances_indirect_beats_direct(spark):
    import pytest

    from biokg_spark.operators.traversal import weighted_distances

    e = spark.createDataFrame(
        [("a", "c", 10.0), ("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 1.0)],
        "src string, dst string, weight double",
    )
    seeds = spark.createDataFrame([("a",)], "id string")
    got = {r.id: r.dist for r in weighted_distances(e, seeds, max_rounds=4).collect()}
    assert got == {"a": 0.0, "b": 1.0, "c": 3.0, "d": 4.0}
    # hop bound 1: only direct edges relax; c keeps the expensive path
    got1 = {r.id: r.dist for r in weighted_distances(e, seeds, max_rounds=1).collect()}
    assert got1 == {"a": 0.0, "b": 1.0, "c": 10.0}
    with pytest.raises(ValueError, match="non-negative"):
        neg = spark.createDataFrame([("a", "b", -1.0)], "src string, dst string, weight double")
        weighted_distances(neg, seeds)
