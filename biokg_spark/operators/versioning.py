"""Snapshot diff: triple-set delta between two KG builds.

The reference rebuilds its whole graph per release and ships flat files
(compile_*.py write full dumps each run); any consumer tracking a live
corpus needs the delta between two builds — which triples appeared,
which disappeared, which persist. This operator is that versioning
primitive, usable on any keyed row set (triples, properties, mentions).

Plan shape: each side is deduplicated on the key columns and the two
sides meet in ONE full-outer hash join on those same columns — the
dedup's hash partitioning is reused by the join (no second exchange per
side), so the whole diff costs one shuffle per side regardless of
|old| and |new|. No collect, no cross product; at 100 TB the diff of
two 10^12-row snapshots is exactly two scans + two shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Row-status delta of two snapshots keyed by ``keys``.

    Returns one row per distinct key tuple present in either snapshot,
    with ``status`` ∈ {'added', 'removed', 'retained'}:

    - added: in ``new`` only
    - removed: in ``old`` only
    - retained: in both
    """
    o = old.select(*keys).dropDuplicates().withColumn("_in_old", F.lit(1))
    n = new.select(*keys).dropDuplicates().withColumn("_in_new", F.lit(1))
    j = o.join(n, keys, "full_outer")
    return j.select(
        *keys,
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("retained"))
        .alias("status"),
    )


def compact_changelog(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak: str,
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Latest-writer-wins snapshot from an append-only changelog — the
    upsert/merge compaction a table-format pipeline (Iceberg MERGE, CDC
    ingestion) runs to turn an event log into current state.

    Keeps, per key tuple, the row with the greatest (``ts_col``,
    ``tiebreak``); if ``op_col`` is given, keys whose LATEST row carries
    ``delete_op`` are dropped entirely (a delete tombstone wins over
    every earlier upsert, and a later upsert resurrects the key).

    Plan shape: ONE window shuffle keyed on the key columns (row_number
    over the per-key order — WindowGroupLimit prunes to the per-key
    top-1 map-side before the shuffle in Spark 3.5+); the tombstone
    filter is a post-filter on the winner row, not a join. Skewed hot
    keys are a non-issue at top-1: the group limit caps every map
    partition's contribution at one row per key.
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak).desc()
    )
    latest = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if op_col is not None:
        latest = latest.where(F.col(op_col) != delete_op)
    return latest


def scd2_intervals(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a changelog: one
    validity interval per VALUE CHANGE, not per event — consecutive
    rows repeating the same value collapse into the open interval
    (true SCD2 change detection, the warehouse primitive next to
    ``snapshot_diff``'s build-over-build delta).

    Returns (*keys, value_col, valid_from, valid_to, is_current):
    ``valid_from`` = the change's timestamp, ``valid_to`` = the NEXT
    change's timestamp (NULL on the open/current version),
    ``is_current`` = 1 on the last version per key.

    Determinism: equal-timestamp events order by ``tiebreak``, so the
    version sequence is engine-exact, not ingest-order-dependent.

    Plan shape: both window passes (lag for change detection, lead for
    interval close) share the SAME (keys, order) spec — one exchange,
    and the second sort runs over the already-filtered change rows
    only. No join, no self-union; at 10^12 changelog rows this is one
    shuffle keyed by the entity key.
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak).asc()
    )
    changes = (
        df.withColumn("_prev", F.lag(value_col).over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col(value_col)))
        .drop("_prev")
    )
    w2 = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak).asc()
    )
    nxt = F.lead(ts_col).over(w2)
    return changes.select(
        *keys,
        F.col(value_col),
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )
