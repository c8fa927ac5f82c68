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
