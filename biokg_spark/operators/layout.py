"""Data-layout keys for multi-column scan pruning (Z-ordering).

A partitioned table prunes well on its partition/sort column and not at
all on others. Z-ordering (Delta/Iceberg ``OPTIMIZE ZORDER BY``) sorts
by the bit-interleaved Morton code of two (or more) columns, so rows
close in EITHER dimension land in the same files and min/max file
statistics prune range predicates on BOTH — the standard lakehouse
layout move before a 100 TB table gets queried by more than one key.

This module provides the Morton key as a pure Column expression — use
it as ``df.repartitionByRange(N, morton).sortWithinPartitions(morton)``
before the write — plus the DuckDB twin generator so the registry can
oracle the locality metric (queries.py::events_zorder_locality
measures chunks-touched under each layout; the demonstration that
z-order pays on both dimensions where a linear sort pays on one).

Everything is integer bit arithmetic: shift/mask/add — bit-exact
across engines, no hash, no float.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Bit-interleaved Morton code of the low ``bits`` of two
    non-negative integer columns: a's bits at even positions, b's at
    odd. Result fits in 2·bits ≤ 62 bits (LONG).

    Callers mask/scale their columns into range first (wrap-around is
    fine for layout purposes — locality only needs NEARBY values to
    share prefixes). The expression is a fixed chain of
    shift/mask/add — whole-stage-codegen'd, no UDF.
    """
    assert 1 <= bits <= 31
    al = a.cast("long")
    bl = b.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(
            F.shiftright(al, i).bitwiseAND(F.lit(1)), 2 * i
        )
        out = out + F.shiftleft(
            F.shiftright(bl, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return out


def morton_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`morton_key` over column expressions
    ``a``/``b`` — the identical shift/mask/add chain."""
    # every shift term is fully parenthesized: SQL's << binds LOOSER
    # than +, so an unwrapped `x << 2 + y << 3` chain parses as
    # `x << (2 + y) << 3` (measured: DuckDB overflow on the chain)
    terms = []
    for i in range(bits):
        terms.append(f"(((({a}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
