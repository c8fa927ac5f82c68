"""Triple verbalization semantics (operators/verbalize.py)."""

from __future__ import annotations

from biokg_spark.operators.verbalize import verbalize_triples


def test_template_render_and_fallback(spark):
    triples = spark.createDataFrame(
        [("a", "DDI", "b"), ("x", "UNKNOWN_PRED", "y")],
        "subj string, pred string, obj string",
    )
    tpl = spark.createDataFrame(
        [("DDI", "{subj} interacts with {obj}")], "pred string, template string"
    )
    got = {r.pred: r.text for r in verbalize_triples(triples, tpl).collect()}
    assert got["DDI"] == "a interacts with b"
    assert got["UNKNOWN_PRED"] == "x is related to y"


def test_every_triple_kept(spark):
    triples = spark.createDataFrame(
        [(f"s{i}", "P", f"o{i}") for i in range(5)],
        "subj string, pred string, obj string",
    )
    tpl = spark.createDataFrame([], "pred string, template string")
    assert verbalize_triples(triples, tpl).count() == 5


def test_placeholder_appears_twice(spark):
    triples = spark.createDataFrame(
        [("a", "P", "b")], "subj string, pred string, obj string"
    )
    tpl = spark.createDataFrame(
        [("P", "{subj} and {obj}: {subj} affects {obj}")],
        "pred string, template string",
    )
    (row,) = verbalize_triples(triples, tpl).collect()
    assert row.text == "a and b: a affects b"
