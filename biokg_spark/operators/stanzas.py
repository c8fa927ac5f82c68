"""Stanza/record assembly from ordered line streams (SURVEY.md §2.1 S2/S3).

The reference's flat-file parsers stream gzip text line-by-line and
accumulate lines until a terminator closes one record: UniProt ``//``
(reference: biokg/processing/parsers.py:447-481), Cellosaurus ``//`` with a
55-line header skip (parsers.py:750-780), KEGG ``///`` (parsers.py:1436-1445),
MeSH blank-line-delimited (parsers.py:3162-3169). That is inherently
order-within-partition logic; the Spark form is a running terminator count
over ``Window.partitionBy(src).orderBy(line_no)`` that assigns every line a
segment id, then a per-(src, segment) aggregation reassembles each record.

Scale note: the window is a single shuffle on the source key (each file's
lines are processed together, in order); the follow-up groupBy reuses the
same key prefix so AQE/exchange-reuse keeps it to one wide stage in
practice. No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_segments(
    lines: DataFrame,
    is_terminator: Column,
    src_col: str = "src",
    line_col: str = "line_no",
    out_col: str = "segment",
) -> DataFrame:
    """Add a 0-based ``segment`` id per (src) from a terminator predicate.

    A terminator line belongs to the segment it closes (like the
    reference's loop, which emits the accumulated entry when it SEES the
    terminator, parsers.py:452-470): segment = running terminator count
    over all PRECEDING rows.
    """
    w = (
        Window.partitionBy(src_col)
        .orderBy(line_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = F.coalesce(
        F.sum(F.when(is_terminator, 1).otherwise(0)).over(w), F.lit(0)
    )
    return lines.withColumn(out_col, seg.cast("long"))


def assemble_stanzas(
    lines: DataFrame,
    is_terminator: Column,
    src_col: str = "src",
    line_col: str = "line_no",
    text_col: str = "text",
    keep_terminator: bool = False,
) -> DataFrame:
    """Reassemble (src, segment) records from an ordered line stream.

    Output: one row per stanza with ``lines`` (ordered array of line
    texts), ``n_lines`` and ``first_line_no``. Terminator lines are
    dropped from the record body by default (the reference never includes
    ``//`` in the parsed entry).
    """
    segged = assign_segments(lines, is_terminator, src_col, line_col)
    body = segged if keep_terminator else segged.where(~is_terminator)
    ordered = F.array_sort(F.collect_list(F.struct(line_col, text_col)))
    return body.groupBy(src_col, "segment").agg(
        F.transform(ordered, lambda s: s[text_col]).alias("lines"),
        F.count(F.lit(1)).alias("n_lines"),
        F.min(line_col).alias("first_line_no"),
    )


def prefix_multiplex(
    stanzas: DataFrame,
    prefix_len: int = 2,
    lines_col: str = "lines",
) -> DataFrame:
    """Fold a stanza's lines into a prefix→values map (S3 analog).

    The reference keys every UniProt stanza line by its 2-char prefix
    (``AC``, ``ID``, ``DE``, …) into a dict (parsers.py:193-372). Spark
    form: explode the line array, split prefix/rest, regroup as a map of
    prefix → ordered concatenated payload.
    """
    exploded = stanzas.select(
        "*", F.posexplode(lines_col).alias("_pos", "_line")
    ).select(
        *[c for c in stanzas.columns if c != lines_col],
        F.substring("_line", 1, prefix_len).alias("prefix"),
        F.ltrim(F.expr(f"substring(_line, {prefix_len + 1})")).alias("payload"),
        "_pos",
    )
    per_prefix = exploded.groupBy(
        *[c for c in stanzas.columns if c != lines_col], "prefix"
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "payload"))),
                lambda s: s["payload"],
            ),
            " ",
        ).alias("value")
    )
    group_cols = [c for c in stanzas.columns if c != lines_col]
    return per_prefix.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("prefix", "value")))
        ).alias("fields")
    )
