"""Multi-granularity time rollups (the brief's "hypertable rollup").

A continuous-aggregate-style rollup: one pass over the event stream
produces aggregates at several time granularities simultaneously via
GROUPING SETS — Spark plans it as a single Expand + one hash aggregate,
so the input is scanned once no matter how many granularities ride along.
At 100 TB the output is tiny (one row per (grain, bucket, key)) and the
rollup table becomes the serving layer; incremental refresh = re-running
the window of buckets a watermark says are still open.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAIN_FMT = {
    "hour": "yyyy-MM-dd HH:00:00",
    "day": "yyyy-MM-dd",
    "month": "yyyy-MM",
}


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    grains: tuple[str, ...] = ("hour", "day"),
    keys: tuple[str, ...] = (),
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Aggregate ``df`` at every grain in one scan.

    Output: (grain, bucket, *keys, aggregates) — one row per grain ×
    bucket × key combination. ``aggs`` defaults to ``count(*) AS n``.
    Implemented as a stacked bucket column + grouping over (grain,
    bucket, keys); Catalyst expands the grains inside the same stage, so
    the source is read once.
    """
    unknown = [g for g in grains if g not in GRAIN_FMT]
    if unknown:
        raise ValueError(f"unknown grains {unknown}; supported: {sorted(GRAIN_FMT)}")
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    stacked = df.select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(g).alias("grain"),
                        F.date_format(F.col(ts_col), GRAIN_FMT[g]).alias("bucket"),
                    )
                    for g in grains
                ]
            )
        ).alias("_gb"),
        *[c for c in df.columns if c not in keys and c != ts_col],
    )
    return (
        stacked.select("_gb.grain", "_gb.bucket", *[c for c in stacked.columns if c != "_gb"])
        .groupBy("grain", "bucket", *keys)
        .agg(*aggs)
    )
