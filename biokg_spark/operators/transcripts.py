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


def preference_pairs(
    df: DataFrame,
    score: "F.Column",
    key_width: int = 2,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
    user_role: str = "user",
) -> DataFrame:
    """Preference-pair (DPO/RLHF-style) export: for each prompt group,
    the best- and worst-scored assistant response become one
    (prompt_key, chosen, rejected) pair.

    A preference dataset needs MULTIPLE responses per prompt; a raw
    transcript corpus has one response per literal prompt, so grouping
    uses a prompt KEY — the first ``key_width`` lowercased whitespace
    tokens of the immediately-preceding user turn (a deterministic
    stand-in for the prompt-clustering step a production pipeline runs;
    the operator takes any precomputed key column shape by mapping over
    its output). ``score`` is the preference signal, any numeric Column
    over a turn row — a trained quality score
    (operators/classifier.py), a rule score, or a length prior.

    Per group: chosen = argmax(score), rejected = argmin(score), ties
    broken (conv_id, turn_idx) ascending on both sides so the pair is
    engine-exact; groups with fewer than 2 candidates or with
    chosen_score == rejected_score emit nothing (no preference signal —
    a tie is not a training pair).

    Shapes: one lag window on conv_id (the pipeline's existing
    turn-order partitioning), then TWO row_number windows over the
    prompt key — one shuffle on the key; both extremes come from the
    same sorted run, joined back key-to-key (each side is exactly one
    row per key, so the join is trivially skew-free even when one
    prompt key is hot).

    Reference: n/a — training-data-pipeline mandate (preference-pair
    construction); cf. Rafailov et al. 2023 (DPO) data format.
    """
    wlag = Window.partitionBy(conv_col).orderBy(turn_col)
    cand = (
        df.withColumn("_prev_role", F.lag(role_col).over(wlag))
        .withColumn("_prompt", F.lag(text_col).over(wlag))
        .where(
            (F.col(role_col) == assistant_role)
            & (F.col("_prev_role") == user_role)
        )
        .select(
            F.array_join(
                F.slice(
                    F.split(F.lower(F.trim(F.col("_prompt"))), " +"),
                    1,
                    key_width,
                ),
                " ",
            ).alias("prompt_key"),
            F.col(conv_col).alias("_c"),
            F.col(turn_col).alias("_t"),
            F.col(text_col).alias("_resp"),
            score.cast("double").alias("_score"),
        )
    )
    wbest = Window.partitionBy("prompt_key").orderBy(
        F.desc("_score"), F.asc("_c"), F.asc("_t")
    )
    wworst = Window.partitionBy("prompt_key").orderBy(
        F.asc("_score"), F.asc("_c"), F.asc("_t")
    )
    ranked = cand.select(
        "prompt_key",
        "_resp",
        "_score",
        F.row_number().over(wbest).alias("_rb"),
        F.row_number().over(wworst).alias("_rw"),
        F.count(F.lit(1)).over(Window.partitionBy("prompt_key")).alias("_n"),
    )
    best = ranked.where(F.col("_rb") == 1).select(
        "prompt_key",
        F.col("_n").alias("n_candidates"),
        F.col("_resp").alias("chosen"),
        F.col("_score").alias("chosen_score"),
    )
    worst = ranked.where(F.col("_rw") == 1).select(
        "prompt_key",
        F.col("_resp").alias("rejected"),
        F.col("_score").alias("rejected_score"),
    )
    return (
        best.join(worst, "prompt_key")
        .where(F.col("chosen_score") > F.col("rejected_score"))
        .select(
            "prompt_key",
            "n_candidates",
            "chosen",
            "rejected",
            "chosen_score",
            "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score")).alias("margin"),
        )
    )


def topic_segments(
    tx: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    threshold: float = 0.1,
) -> DataFrame:
    """TextTiling-style topic segmentation of conversations (Hearst
    1997, block comparison at block size 2): at each turn boundary,
    lexical cohesion = Jaccard between the union of the two PRECEDING
    turns' token sets and the union of the current + next turns'; a
    boundary opens where cohesion drops below ``threshold``. The
    transcript-native segmentation pass before per-topic extraction —
    finer than idle-gap sessionization (temporal.py), which needs
    timestamps and long gaps.

    Returns (conv_col, order_col, n_prev, n_next, cohesion,
    is_boundary) for every turn with at least one preceding turn;
    cohesion is NULL when both blocks are empty (blank turns).
    Integer set sizes and one division — engine-exact at 4 dp.

    Plan shape: ONE window shuffle keyed by conversation (the
    pipeline's existing turn-order partitioning); the block union is
    lag/lead array composition inside that window — no self-join, no
    explode. Conversations are bounded (10^2-10^4 turns), so the
    per-key sorted partition is never the 100 TB skew case.
    """
    empty = F.array().cast("array<string>")
    w = Window.partitionBy(conv_col).orderBy(order_col)
    s = F.array_distinct(
        F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    )
    base = tx.select(conv_col, order_col, s.alias("_s"))
    blocks = base.select(
        conv_col,
        order_col,
        F.array_union(
            F.coalesce(F.lag("_s", 1).over(w), empty),
            F.coalesce(F.lag("_s", 2).over(w), empty),
        ).alias("_prev"),
        F.array_union(
            F.col("_s"), F.coalesce(F.lead("_s", 1).over(w), empty)
        ).alias("_next"),
        F.row_number().over(w).alias("_rn"),
    ).where(F.col("_rn") >= 2)
    inter = F.size(F.array_intersect("_prev", "_next"))
    uni = F.size(F.array_union("_prev", "_next"))
    cohesion = F.when(uni > 0, F.round(inter * F.lit(1.0) / uni, 4))
    return blocks.select(
        conv_col,
        order_col,
        F.size("_prev").cast("long").alias("n_prev"),
        F.size("_next").cast("long").alias("n_next"),
        cohesion.alias("cohesion"),
        F.coalesce(cohesion < threshold, F.lit(False)).alias("is_boundary"),
    )


def turn_loops(
    tx: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    suspect_run: int = 3,
) -> DataFrame:
    """Bot-loop detection: run-lengths of IDENTICAL consecutive turns
    (normalized-text fingerprints) per conversation, via the gap-group
    idiom — lag-compare flags run starts, a running sum numbers the
    runs, one aggregate sizes them. Returns per conversation
    (n_turns, n_distinct_turns, max_run, n_looped_turns,
    is_loop_suspect at max_run ≥ ``suspect_run``).

    The consecutive form is what conversation-level MinHash cannot
    see: near-dup finds twin conversations, this finds an agent stuck
    repeating itself WITHIN one. Both window passes share the single
    conversation-keyed exchange; all outputs integer-derived.
    """
    f = F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " "))
    w = Window.partitionBy(conv_col).orderBy(order_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    fp = tx.select(conv_col, order_col, f.alias("_f"))
    flagged = fp.select(
        conv_col,
        order_col,
        "_f",
        F.when(
            F.lag("_f").over(w).isNull() | (F.lag("_f").over(w) != F.col("_f")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new_run"),
    )
    runs = flagged.select(
        conv_col, "_f", F.sum("_new_run").over(wrun).alias("_run_id")
    )
    run_lens = runs.groupBy(conv_col, "_run_id").agg(
        F.count(F.lit(1)).alias("_run_len")
    )
    per_conv = run_lens.groupBy(conv_col).agg(
        F.max("_run_len").cast("long").alias("max_run"),
        F.sum(F.when(F.col("_run_len") > 1, F.col("_run_len")).otherwise(0))
        .cast("long")
        .alias("n_looped_turns"),
    )
    tot = fp.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.count_distinct("_f").cast("long").alias("n_distinct_turns"),
    )
    return per_conv.join(tot, conv_col).select(
        conv_col,
        "n_turns",
        "n_distinct_turns",
        "max_run",
        "n_looped_turns",
        (F.col("max_run") >= suspect_run).alias("is_loop_suspect"),
    )
