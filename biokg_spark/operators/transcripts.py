"""Transcript-table audits and analytics over (conv_id, turn_idx, role,
text, tool, ts) — the input contract of the whole pipeline (input_hint).

The reference validates its inputs ad hoc while parsing (each parse_*
function silently skips malformed stanzas); an engine ingesting 10^12
turns needs the validation as a first-class, inspectable operator, and
needs per-conversation behavioral summaries (which tool follows which)
for routing/quality decisions.

Both operators are one groupBy/window shuffle on conv_id — the same
partitioning the pipeline's turn-ordering stage already uses, so at
scale these audits piggyback on an existing exchange rather than adding
one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transcript_integrity(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """Per-conversation structural-integrity audit.

    Columns per conv_id:

    - n_turns: raw row count
    - n_distinct_turns: distinct turn_idx values
    - n_dup_turns: rows sharing a turn_idx with another row
      (n_turns − n_distinct_turns)
    - n_missing_turns: holes in the 0..max(turn_idx) range
      (max+1 − n_distinct_turns)
    - n_roles: distinct role values

    A clean conversation has n_dup_turns = n_missing_turns = 0. Pure
    aggregate — one partial+final groupBy on conv_id, no window, no
    collect; count_distinct is two-phase (expand + merge), still a
    single exchange.
    """
    return (
        df.groupBy(F.col(conv_col).alias("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count_distinct(F.col(turn_col)).alias("n_distinct_turns"),
            F.max(F.col(turn_col)).alias("_max_turn"),
            F.count_distinct(F.col(role_col)).alias("n_roles"),
        )
        .select(
            "conv_id",
            "n_turns",
            "n_distinct_turns",
            (F.col("n_turns") - F.col("n_distinct_turns")).alias("n_dup_turns"),
            (F.col("_max_turn") + 1 - F.col("n_distinct_turns")).alias(
                "n_missing_turns"
            ),
            "n_roles",
        )
    )


def tool_transitions(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """Tool-usage bigram counts: how often ``tool`` follows ``prev_tool``
    across consecutive turns of the same conversation.

    Returns (prev_tool, tool, n_transitions, n_convs) — the first-order
    Markov profile of agent behavior (n_convs = conversations where the
    transition occurs at least once). The first turn of each
    conversation has no predecessor and is excluded.

    ``turn_col`` must be a deterministic total order within each
    conversation (the input contract's stable turn ordering) — otherwise
    lag() is ambiguous. One window shuffle on conv_id + one partial
    aggregate on the (prev, cur) pair; transition vocabulary is
    |tools|², so the final aggregate is dim-sized however large the
    input.
    """
    w = Window.partitionBy(conv_col).orderBy(F.col(turn_col).asc())
    pairs = df.select(
        F.col(conv_col).alias("conv_id"),
        F.lag(F.col(tool_col)).over(w).alias("prev_tool"),
        F.col(tool_col).alias("tool"),
    ).where(F.col("prev_tool").isNotNull())
    return pairs.groupBy("prev_tool", "tool").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.count_distinct("conv_id").alias("n_convs"),
    )


def sft_pairs(
    df: DataFrame,
    k: int = 3,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
) -> DataFrame:
    """(context, response) supervised-fine-tuning pairs from transcripts:
    for every assistant turn, the response is that turn's text and the
    context is the up-to-``k`` preceding turns rendered ``role: text``
    and newline-joined in turn order — the standard chat-template
    export a transcript corpus feeds to an SFT trainer.

    Turns with NO preceding context (an assistant turn opening a
    conversation) are dropped — a pair without a prompt is untrainable.

    ONE window shuffle on conv_id (the pipeline's existing turn-order
    partitioning); the frame is ROWS BETWEEN k PRECEDING AND 1
    PRECEDING, so context length is bounded by construction — no
    per-conversation collect, no skew beyond conversation length.
    """
    w = (
        Window.partitionBy(conv_col)
        .orderBy(turn_col)
        .rowsBetween(-k, -1)
    )
    line = F.concat_ws(": ", F.col(role_col), F.col(text_col))
    ctx = F.array_join(F.collect_list(line).over(w), "\n")
    return (
        df.withColumn("context", ctx)
        .where((F.col(role_col) == assistant_role) & (F.col("context") != ""))
        .select(
            conv_col,
            turn_col,
            "context",
            F.col(text_col).alias("response"),
        )
    )
