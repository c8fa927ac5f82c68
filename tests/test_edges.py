from __future__ import annotations

from biokg_spark.operators.edges import (
    canonical_undirected,
    conflict_exclusion,
    union_refs,
)


def test_canonical_undirected(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("c", "c"), ("a", "z")], "subj string, obj string"
    )
    got = {(r.subj, r.obj) for r in canonical_undirected(df).collect()}
    assert got == {("a", "b"), ("c", "c"), ("a", "z")}


def test_conflict_exclusion(spark):
    df = spark.createDataFrame(
        [
            ("d1", "p1", "INCREASES"),
            ("d1", "p1", "DECREASES"),  # conflict → dropped
            ("d2", "p1", "INCREASES"),
            ("d2", "p1", "INCREASES"),
            ("d3", "p2", "DECREASES"),
        ],
        "drug string, prot string, effect string",
    )
    got = {
        (r.drug, r.prot, r.effect)
        for r in conflict_exclusion(df, ["drug", "prot"], "effect").collect()
    }
    assert got == {("d2", "p1", "INCREASES"), ("d3", "p2", "DECREASES")}


def test_union_refs_array_input(spark):
    df = spark.createDataFrame(
        [
            ("a", "b", ["1", "2"]),
            ("a", "b", ["2", "3", "unassigned"]),
            ("x", "y", ["unassigned"]),  # empties out → dropped
        ],
        "s string, o string, pmids array<string>",
    )
    rows = union_refs(df, ["s", "o"]).collect()
    assert len(rows) == 1
    assert rows[0].s == "a" and rows[0].refs == ["1", "2", "3"]


def test_union_refs_comma_string_input(spark):
    df = spark.createDataFrame(
        [("a", "b", "5,1"), ("a", "b", "1,9")], "s string, o string, pmids string"
    )
    rows = union_refs(df, ["s", "o"]).collect()
    assert rows[0].refs == ["1", "5", "9"]
