"""Deterministic HLL sketches (operators/sketches.py)."""

from __future__ import annotations

import math

import duckdb
from pyspark.sql import functions as F

from biokg_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _df(spark, vals):
    return spark.createDataFrame(
        [("k", v) for v in vals], "key string, v long"
    )


def test_registers_merge_equals_whole(spark):
    # the mergeability contract: registers(A) max-merged with
    # registers(B) == registers(A ∪ B), exactly
    a = hll_registers(_df(spark, range(0, 500)), ["key"], "v")
    b = hll_registers(_df(spark, range(250, 800)), ["key"], "v")
    merged = sorted(
        map(tuple, hll_merge(a.union(b), ["key"]).collect())
    )
    whole = sorted(
        map(tuple, hll_registers(_df(spark, range(0, 800)), ["key"], "v").collect())
    )
    assert merged == whole


def test_estimate_deterministic_across_partitioning(spark):
    d = _df(spark, range(3000))
    e1 = hll_estimate(hll_registers(d, ["key"], "v"), ["key"]).collect()
    e2 = hll_estimate(
        hll_registers(d.repartition(7), ["key"], "v"), ["key"]
    ).collect()
    assert e1[0]["est_distinct"] == e2[0]["est_distinct"]


def test_estimate_accuracy_and_duplicate_insensitivity(spark):
    # HLL stderr at m=1024 is ~3.25%; assert a loose 10% band, and that
    # duplicates do not move the estimate at all (hash of a repeated
    # value lands in the same register)
    n = 5000
    once = hll_estimate(
        hll_registers(_df(spark, range(n)), ["key"], "v", b=10), ["key"], b=10
    ).collect()[0]["est_distinct"]
    thrice = hll_estimate(
        hll_registers(_df(spark, list(range(n)) * 3), ["key"], "v", b=10),
        ["key"],
        b=10,
    ).collect()[0]["est_distinct"]
    assert abs(once - n) / n < 0.10
    assert once == thrice


def test_linear_counting_small_set_is_near_exact(spark):
    # 30 distinct values, m=1024: linear counting regime, error << 1
    est = hll_estimate(
        hll_registers(_df(spark, range(30)), ["key"], "v", b=10), ["key"], b=10
    ).collect()[0]
    assert est["v_zero"] >= 1024 - 30
    assert abs(est["est_distinct"] - 30) < 2


def test_lc_literals_round_trip_in_duckdb(spark):
    # the linear-counting branch ships PRECOMPUTED m*ln(m/V) literals
    # to both engines instead of calling libm (Java vs DuckDB ln
    # genuinely diverges by a ulp on some arguments — e.g. ln(64/21) —
    # which is why the dim exists). The cross-engine contract is that
    # the shortest float repr parses back to the identical double in
    # DuckDB; pin it for every reachable V at both sketch widths.
    from biokg_spark.operators.sketches import _lc_table

    for m in (64, 1024):
        tbl = _lc_table(m)
        from biokg_spark.operators.sketches import _sql_double

        vals = ",".join(f"({v}, {_sql_double(e)})" for v, e in tbl)
        got = dict(
            duckdb.sql(f"SELECT * FROM (VALUES {vals}) t(v, e)").fetchall()
        )
        for v, e in tbl:
            assert got[v] == e, (m, v)
            assert math.isclose(e, m * math.log(m / v), rel_tol=1e-15)
