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

# --- changelog compaction -------------------------------------------------

CL_SCHEMA = "k string, v string, ts int, seq int, op string"


def _compact(spark, rows, **kw):
    from biokg_spark.operators.versioning import compact_changelog

    df = spark.createDataFrame(rows, CL_SCHEMA)
    out = compact_changelog(df, keys=["k"], ts_col="ts", tiebreak="seq", **kw)
    return {r.k: (r.v, r.ts, r.seq) for r in out.collect()}


def test_compact_latest_wins(spark):
    rows = [("a", "v1", 1, 1, "upsert"), ("a", "v2", 2, 2, "upsert"),
            ("b", "w1", 5, 3, "upsert")]
    assert _compact(spark, rows) == {"a": ("v2", 2, 2), "b": ("w1", 5, 3)}


def test_compact_equal_ts_tiebreak(spark):
    rows = [("a", "first", 1, 1, "upsert"), ("a", "second", 1, 2, "upsert")]
    assert _compact(spark, rows) == {"a": ("second", 1, 2)}


def test_compact_delete_tombstone_and_resurrection(spark):
    rows = [
        ("gone", "v", 1, 1, "upsert"), ("gone", "-", 2, 2, "delete"),
        ("back", "v", 1, 3, "upsert"), ("back", "-", 2, 4, "delete"),
        ("back", "v2", 3, 5, "upsert"),
    ]
    # without op_col the tombstone row itself wins like any other row
    assert _compact(spark, rows)["gone"] == ("-", 2, 2)
    # with op_col: latest-delete keys drop, later upsert resurrects
    got = _compact(spark, rows, op_col="op")
    assert "gone" not in got and got["back"] == ("v2", 3, 5)


# --- SCD2 validity intervals ----------------------------------------------


def _scd2(spark, rows):
    from biokg_spark.operators.versioning import scd2_intervals

    df = spark.createDataFrame(rows, "k string, v string, ts int, seq int")
    out = scd2_intervals(df, keys=["k"], value_col="v", ts_col="ts",
                         tiebreak="seq")
    return sorted(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    )


def test_scd2_collapses_repeats_and_closes_intervals(spark):
    rows = [("a", "x", 1, 1), ("a", "x", 2, 2), ("a", "y", 3, 3),
            ("a", "y", 4, 4), ("a", "x", 5, 5)]
    # versions: x@[1,3), y@[3,5), x@[5,None) — repeats at ts 2 and 4
    # open no new version
    assert _scd2(spark, rows) == [
        ("a", "x", 1, 3, 0), ("a", "x", 5, None, 1), ("a", "y", 3, 5, 0),
    ]


def test_scd2_single_event_is_current(spark):
    assert _scd2(spark, [("a", "x", 7, 1)]) == [("a", "x", 7, None, 1)]


def test_scd2_equal_ts_orders_by_tiebreak(spark):
    # both events at ts=1: seq decides the sequence x -> y, so y is
    # current and x closes at 1
    rows = [("a", "y", 1, 2), ("a", "x", 1, 1)]
    assert _scd2(spark, rows) == [("a", "x", 1, 1, 0), ("a", "y", 1, None, 1)]
