"""ANALYZE-style table profiling (operators/profile.py)."""

from __future__ import annotations

from biokg_spark.operators.profile import profile_table


def test_profile_table_hand_fixture(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha", 2.5),
            (2, "beta", None),
            (3, None, 7.5),
            (3, "alpha", 0.0),
        ],
        "id long, name string, score double",
    )
    got = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    assert set(got) == {"id", "name", "score"}

    i = got["id"]
    assert (i["n_rows"], i["n_null"]) == (4, 0)
    assert (i["min_num"], i["max_num"]) == (1.0, 3.0)
    # 3 distinct small values: HLL linear-counting regime is near-exact
    assert abs(i["est_ndv"] - 3) < 0.1

    n = got["name"]
    assert (n["n_rows"], n["n_null"]) == (4, 1)
    # non-numeric column: numeric range is NULL, lengths are real
    assert n["min_num"] is None and n["max_num"] is None
    assert n["max_len"] == 5 and abs(n["est_ndv"] - 2) < 0.1
    assert n["avg_len"] == 4.67  # (5 + 4 + 5) / 3 rounded

    s = got["score"]
    assert (s["n_null"], s["min_num"], s["max_num"]) == (1, 0.0, 7.5)


def test_profile_column_subset(spark):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    rows = profile_table(df, ["b"]).collect()
    assert [r["column"] for r in rows] == ["b"]


def test_column_histogram_hand_fixture(spark):
    from biokg_spark.operators.profile import column_histogram

    # values 0..10 into 10 bins of width 1; v == max closes the top bin
    df = spark.createDataFrame(
        [(float(v),) for v in range(11)] + [(None,)], "v double"
    )
    got = {r["bin"]: r for r in column_histogram(df, "v", 10).collect()}
    assert set(got) == set(range(10))
    assert all(got[b]["cnt"] == 1 for b in range(9))
    assert got[9]["cnt"] == 2  # 9.0 and the closed top edge 10.0
    assert (got[0]["bin_lo"], got[0]["bin_hi"]) == (0.0, 1.0)
    assert (got[9]["bin_lo"], got[9]["bin_hi"]) == (9.0, 10.0)


def test_column_histogram_degenerate_single_value(spark):
    from biokg_spark.operators.profile import column_histogram

    df = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    rows = column_histogram(df, "v", 10).collect()
    assert len(rows) == 1
    assert (rows[0]["bin"], rows[0]["cnt"]) == (0, 2)


def test_morton_key_interleaves_bits(spark):
    from biokg_spark.operators.layout import morton_key
    from pyspark.sql import functions as F

    # hand-checkable: a=0b101 (bits at even positions), b=0b011 (odd)
    # -> m = 1*1 + 1*2 + 0*4 + 1*8 + 1*16 + 0*32 = 0b11011 = 27
    df = spark.createDataFrame([(5, 3)], "a long, b long")
    got = df.select(morton_key(F.col("a"), F.col("b"), 3).alias("m")).collect()
    assert got[0]["m"] == 27


def test_morton_key_prefix_locality(spark):
    from biokg_spark.operators.layout import morton_key
    from pyspark.sql import functions as F

    # nearby (a, b) points share high Morton bits; distant ones do not
    rows = [(a, b) for a in range(0, 256, 17) for b in range(0, 256, 13)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.select(
        "a", "b", morton_key(F.col("a"), F.col("b"), 8).alias("m")
    ).collect()
    for r in out:
        # high half of the key is exactly the interleave of high halves
        expect_hi = sum(
            (((r["a"] >> (4 + i)) & 1) << (2 * i))
            + (((r["b"] >> (4 + i)) & 1) << (2 * i + 1))
            for i in range(4)
        )
        assert r["m"] >> 8 == expect_hi
