from __future__ import annotations

from biokg_spark.operators.hierarchy import expand_prefixes


def test_mesh_style_tree(spark):
    df = spark.createDataFrame([("D1", "C04.557.470")], "id string, code string")
    got = {(r.level, r.prefix) for r in expand_prefixes(df, "code").collect()}
    assert got == {(1, "C04"), (2, "C04.557"), (3, "C04.557.470")}


def test_single_level(spark):
    df = spark.createDataFrame([("D1", "C04")], "id string, code string")
    got = [(r.level, r.prefix) for r in expand_prefixes(df, "code").collect()]
    assert got == [(1, "C04")]


def test_exclude_full(spark):
    df = spark.createDataFrame([("D1", "a.b.c")], "id string, code string")
    got = {r.prefix for r in expand_prefixes(df, "code", include_full=False).collect()}
    assert got == {"a", "a.b"}
