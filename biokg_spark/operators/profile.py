"""ANALYZE-style table profiling: the stats collector behind plan
decisions.

Broadcast-vs-shuffle, salting, bucketing, and AQE thresholds are all
bets on column statistics — ndv, null fraction, value widths, numeric
ranges. A warehouse keeps these from ANALYZE; this operator computes
them as ONE pass of DataFrame aggregates so a 10^12-row table gets
profiled at scan cost, with the ndv coming from the deterministic HLL
sketch (operators/sketches.py) instead of an exact count-distinct whose
partial buffers would hold the distinct set itself.

Deliberate design constraint: NO string min/max. A min/max over a
STRING buffer is not HashAggregate-able — Catalyst silently falls back
to Sort+SortAggregate over the full input (the measured 258 s hazard
the plan auditor now flags), and string extrema are rarely
load-bearing for planning anyway. The profile reports numeric min/max
(cast; NULL for non-numeric columns — range-pruning stats) and
length stats for strings, so every aggregate in the plan keeps
long/double buffers.

Plan shape: one ×|columns| constant explode to long form, then TWO
map-side-partial HashAggregates — base stats keyed by column name, HLL
registers keyed by (column, bucket) — joined on the |columns|-sized
output frame. Nothing downstream of the partials is data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biokg_spark.operators.sketches import hll_estimate, hll_registers


def profile_table(
    df: DataFrame, columns: list[str] | None = None, hll_b: int = 10
) -> DataFrame:
    """One profile row per column:
    (column, n_rows, n_null, est_ndv, avg_len, max_len, min_num,
    max_num) — avg_len rounded to 2 dp, min/max_num NULL for columns
    with no numeric-castable values."""
    cols = columns or df.columns
    long = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                        # try_cast: ANSI mode (Spark 4 default) makes a
                        # plain cast THROW on non-numeric strings
                        F.col(c).try_cast("double").alias("vn"),
                    )
                    for c in cols
                ]
            )
        ).alias("_c")
    ).select("_c.column", "_c.v", "_c.vn")
    base = long.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("v").isNull(), F.lit(1))).alias("n_null"),
        F.round(F.avg(F.length("v")), 2).alias("avg_len"),
        F.max(F.length("v")).alias("max_len"),
        F.min("vn").alias("min_num"),
        F.max("vn").alias("max_num"),
    )
    ndv = hll_estimate(
        hll_registers(long.where(F.col("v").isNotNull()), ["column"], "v", b=hll_b),
        ["column"],
        b=hll_b,
    ).select("column", F.col("est_distinct").alias("est_ndv"))
    return base.join(ndv, "column", "left").select(
        "column",
        "n_rows",
        "n_null",
        F.coalesce("est_ndv", F.lit(0.0)).alias("est_ndv"),
        "avg_len",
        F.col("max_len").cast("long").alias("max_len"),
        "min_num",
        "max_num",
    )


def column_histogram(
    df: DataFrame, value_col: str, bins: int = 10
) -> DataFrame:
    """Equi-width histogram of a numeric column — the other half of
    ANALYZE next to :func:`profile_table`'s scalar stats: selectivity
    estimation for range predicates and the skew-at-a-glance view
    before choosing partition bounds. Returns one row per OCCUPIED
    bin: (bin, bin_lo, bin_hi, cnt), bin in [0, bins).

    The [min, max] bounds ride in-plan as a 1-row aggregate
    broadcast-crossed onto the rows (the HITS in-plan-scalar idiom —
    no driver collect, no second pass trigger); binning is one fixed
    float expression (deterministic — same arithmetic both engines),
    the top edge closed (v == max lands in the last bin), degenerate
    min == max collapses to bin 0. ONE map-side-partial HashAggregate
    down to ≤ bins rows.
    """
    assert bins >= 1
    v = F.col(value_col).cast("double")
    bounds = df.where(v.isNotNull()).agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi")
    )
    binned = (
        df.where(v.isNotNull())
        .crossJoin(bounds)
        .select(
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (v - F.col("_lo")) * bins / (F.col("_hi") - F.col("_lo"))
                    ),
                )
            )
            .cast("int")
            .alias("bin"),
            "_lo",
            "_hi",
        )
    )
    width = (F.col("_hi") - F.col("_lo")) / bins
    return (
        binned.groupBy("bin", "_lo", "_hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bin",
            F.round(F.col("_lo") + F.col("bin") * width, 4).alias("bin_lo"),
            F.round(F.col("_lo") + (F.col("bin") + 1) * width, 4).alias("bin_hi"),
            "cnt",
        )
    )
