"""Skew-mitigation helpers: explicit key salting for fact-fact joins.

The reference never needed this (single machine, in-memory dicts), but the
north rule calls out skewed high-frequency entities — e.g. a hot entity
appearing in a large fraction of turns makes the mention×candidate join
key pathological. AQE skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on by default in session.py)
handles shuffle skew after the fact; ``salt_join`` prevents it up front by
fanning one hot key into ``n_salts`` synthetic keys and replicating the
smaller side to match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join ``left⋈right on key`` with salted key distribution.

    The big (skewed) side gets ``salt = pmod(hash(all cols), n)``; the
    small side is exploded ×``n_salts`` so every salted partition finds its
    match. Correct for 1:N joins where ``right`` is the N=1 side per key.
    """
    salted_left = left.withColumn(
        "_salt", F.pmod(F.hash(*left.columns), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    salted_right = right.withColumn("_salt", salts)
    out = salted_left.join(salted_right, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def salted_collect_set(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    out_col: str = "values",
    n_salts: int = 32,
) -> DataFrame:
    """Distinct-set aggregation that survives hot keys.

    A plain ``groupBy(keys).agg(collect_set(v))`` funnels every partial set
    of a hot key into ONE reducer whose set grows unbounded (a
    high-frequency entity mentioned in a large share of turns → millions of
    refs on one task). Two phases fix the merge-side skew: phase 1 groups by
    ``(keys, salt(v))`` so each reducer builds at most ``1/n_salts`` of a
    hot key's set; phase 2 merges ``n_salts`` pre-deduped arrays per key.
    Output: one row per key group with a sorted distinct ``out_col`` array.
    """
    partial = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).cast("int")
        )
        .groupBy(*keys, "_salt")
        .agg(F.collect_set(value_col).alias("_part"))
    )
    return partial.groupBy(*keys).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_part")))).alias(out_col)
    )
