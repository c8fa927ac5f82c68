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

from pyspark.sql import DataFrame
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
