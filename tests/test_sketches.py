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


# --- Count-Min ------------------------------------------------------------


def _cm_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_cm_merge_equals_whole(spark):
    from biokg_spark.operators.sketches import cm_merge, cm_registers

    a = cm_registers(_cm_df(spark, ["x"] * 5 + ["y"]), [], "v")
    b = cm_registers(_cm_df(spark, ["x"] * 2 + ["z"] * 3), [], "v")
    merged = sorted(map(tuple, cm_merge(a.union(b), []).collect()))
    whole = sorted(
        map(
            tuple,
            cm_registers(
                _cm_df(spark, ["x"] * 7 + ["y"] + ["z"] * 3), [], "v"
            ).collect(),
        )
    )
    assert merged == whole


def test_cm_estimate_never_underestimates(spark):
    from biokg_spark.operators.sketches import cm_estimate, cm_registers

    vals = [f"v{i}" for i in range(500) for _ in (0,)] + ["hot"] * 40
    regs = cm_registers(_cm_df(spark, vals), [], "v", depth=4, width=64)
    items = _cm_df(spark, ["hot", "v3", "v499"])
    got = {
        r["v"]: r["est_count"]
        for r in cm_estimate(regs, items, [], "v", depth=4, width=64).collect()
    }
    # one-sided error: est >= true, and with 4 rows x 64 cols over 540
    # increments the hot item's overshoot stays small
    assert got["hot"] >= 40 and got["v3"] >= 1 and got["v499"] >= 1
    assert got["hot"] <= 40 + 540 // 8


def test_cm_absent_item_estimates_zero_or_collisions_only(spark):
    from biokg_spark.operators.sketches import cm_estimate, cm_registers

    regs = cm_registers(_cm_df(spark, ["a", "b"]), [], "v", depth=4, width=256)
    got = cm_estimate(
        regs, _cm_df(spark, ["never-seen"]), [], "v", depth=4, width=256
    ).collect()[0]["est_count"]
    # with 2 increments over 256 columns a collision on ALL 4 rows is
    # (practically) impossible — the min probes an empty cell
    assert got == 0


def test_cm_keyed_sketches_are_independent(spark):
    from biokg_spark.operators.sketches import cm_estimate, cm_registers

    df = spark.createDataFrame(
        [("k1", "x"), ("k1", "x"), ("k2", "x")], "grp string, v string"
    )
    regs = cm_registers(df, ["grp"], "v")
    items = spark.createDataFrame(
        [("k1", "x"), ("k2", "x")], "grp string, v string"
    )
    got = {
        r["grp"]: r["est_count"]
        for r in cm_estimate(regs, items, ["grp"], "v").collect()
    }
    assert got == {"k1": 2, "k2": 1}


# --- streaming register maintenance ---------------------------------------


def _write_increments(spark, src):
    # three files -> three micro-batches; value ranges overlap so the
    # distinct set is NOT the row count
    for i in range(3):
        spark.createDataFrame(
            [("k", v) for v in range(i * 200, i * 200 + 300)],
            "key string, v long",
        ).coalesce(1).write.mode("append").parquet(src)


def test_streaming_hll_register_maintenance(spark, tmp_path):
    # the mergeable-artifact claim end-to-end: a foreachBatch loop that
    # max-merges each micro-batch's registers into a persisted state
    # table ends at EXACTLY the batch sketch over the whole stream
    from biokg_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    tmp = str(tmp_path / "state_tmp")
    _write_increments(spark, src)
    df = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def upd(batch, _bid):
        s = batch.sparkSession
        regs = hll_registers(batch, ["key"], "v")
        try:
            regs = hll_merge(s.read.parquet(state).union(regs), ["key"])
        except Exception:
            pass  # first batch: no state yet
        regs.write.mode("overwrite").parquet(tmp)
        s.read.parquet(tmp).write.mode("overwrite").parquet(state)

    q = stream.writeStream.foreachBatch(upd).trigger(availableNow=True).start()
    q.awaitTermination(180)
    streamed = sorted(
        map(tuple, hll_estimate(spark.read.parquet(state), ["key"]).collect())
    )
    batch = sorted(
        map(tuple, hll_estimate(hll_registers(df, ["key"], "v"), ["key"]).collect())
    )
    assert streamed == batch


def test_streaming_cm_register_maintenance(spark, tmp_path):
    from biokg_spark.operators.sketches import cm_merge, cm_registers

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    tmp = str(tmp_path / "state_tmp")
    _write_increments(spark, src)
    df = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def upd(batch, _bid):
        s = batch.sparkSession
        regs = cm_registers(batch, ["key"], "v")
        try:
            regs = cm_merge(s.read.parquet(state).union(regs), ["key"])
        except Exception:
            pass
        regs.write.mode("overwrite").parquet(tmp)
        s.read.parquet(tmp).write.mode("overwrite").parquet(state)

    q = stream.writeStream.foreachBatch(upd).trigger(availableNow=True).start()
    q.awaitTermination(180)
    streamed = sorted(map(tuple, spark.read.parquet(state).collect()))
    batch = sorted(map(tuple, cm_registers(df, ["key"], "v").collect()))
    assert streamed == batch
