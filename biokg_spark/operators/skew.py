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
