"""Hierarchy-code prefix expansion — pure Spark SQL, no UDF.

The reference expands MeSH tree codes ``C04.557.470`` to every ancestor
prefix with a Python loop (reference: parsers.py:3073-3083) and ATC codes
to 5 fixed-length prefixes (reference: parsers.py:1035-1039). Both are the
same operator: explode a delimited path into all its prefixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_prefixes(
    df: DataFrame,
    code_col: str,
    sep: str = ".",
    out_col: str = "prefix",
    level_col: str = "level",
    include_full: bool = True,
) -> DataFrame:
    """Emit one row per prefix of ``code_col`` split on ``sep``.

    ``C04.557.470`` → (1, ``C04``), (2, ``C04.557``), (3, ``C04.557.470``).
    Implemented as sequence+transform+posexplode so Catalyst keeps it
    inside whole-stage codegen — no shuffle, no Python.
    """
    parts = F.split(F.col(code_col), "[" + sep + "]")
    n = F.size(parts)
    upper = n if include_full else n - 1
    prefixes = F.transform(
        F.sequence(F.lit(1), upper),
        lambda i: F.array_join(F.slice(parts, 1, i), sep),
    )
    exploded = df.select(
        "*", F.posexplode(prefixes).alias("_pos", out_col)
    )
    return exploded.withColumn(level_col, F.col("_pos") + 1).drop("_pos")
