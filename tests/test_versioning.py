"""Snapshot diff semantics (operators/versioning.py)."""

from __future__ import annotations

from biokg_spark.operators.versioning import snapshot_diff

SCHEMA = "subj string, pred string, obj string"


def _run(spark, old, new):
    o = spark.createDataFrame(old, SCHEMA)
    n = spark.createDataFrame(new, SCHEMA)
    out = snapshot_diff(o, n, keys=["subj", "pred", "obj"])
    return {(r.subj, r.pred, r.obj): r.status for r in out.collect()}


def test_added_removed_retained(spark):
    old = [("a", "p", "b"), ("a", "p", "c")]
    new = [("a", "p", "b"), ("x", "q", "y")]
    assert _run(spark, old, new) == {
        ("a", "p", "b"): "retained",
        ("a", "p", "c"): "removed",
        ("x", "q", "y"): "added",
    }


def test_duplicates_collapse(spark):
    # snapshots are SETS: input multiplicity does not matter
    old = [("a", "p", "b")] * 3
    new = [("a", "p", "b"), ("a", "p", "b")]
    assert _run(spark, old, new) == {("a", "p", "b"): "retained"}


def test_empty_sides(spark):
    assert _run(spark, [], [("a", "p", "b")]) == {("a", "p", "b"): "added"}
    assert _run(spark, [("a", "p", "b")], []) == {("a", "p", "b"): "removed"}


def test_one_row_per_key(spark):
    old = [("a", "p", "b"), ("c", "p", "d")]
    new = [("a", "p", "b"), ("c", "q", "d")]
    o = spark.createDataFrame(old, SCHEMA)
    n = spark.createDataFrame(new, SCHEMA)
    out = snapshot_diff(o, n, keys=["subj", "pred", "obj"])
    assert out.count() == out.select("subj", "pred", "obj").distinct().count()
