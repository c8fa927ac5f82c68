"""Transcript integrity + tool-transition semantics
(operators/transcripts.py)."""

from __future__ import annotations

from biokg_spark.operators.transcripts import (
    tool_transitions,
    transcript_integrity,
)

TX_SCHEMA = "conv_id string, turn_idx int, role string, tool string"


def test_integrity_clean_conversation(spark):
    rows = [("c1", i, "user" if i % 2 == 0 else "assistant", "t") for i in range(4)]
    df = spark.createDataFrame(rows, TX_SCHEMA)
    r = transcript_integrity(df).collect()[0]
    assert (r.n_turns, r.n_distinct_turns, r.n_dup_turns) == (4, 4, 0)
    assert (r.n_missing_turns, r.n_roles) == (0, 2)


def test_integrity_dups_and_gaps(spark):
    # turn 1 appears twice, turns 2 and 4 are missing (max=5)
    rows = [
        ("c1", 0, "user", "t"),
        ("c1", 1, "assistant", "t"),
        ("c1", 1, "assistant", "t"),
        ("c1", 3, "user", "t"),
        ("c1", 5, "assistant", "t"),
    ]
    df = spark.createDataFrame(rows, TX_SCHEMA)
    r = transcript_integrity(df).collect()[0]
    assert (r.n_turns, r.n_distinct_turns, r.n_dup_turns) == (5, 4, 1)
    assert (r.n_missing_turns, r.n_roles) == (2, 2)


def test_tool_transitions_bigrams(spark):
    rows = [
        ("c1", 0, "u", "search"),
        ("c1", 1, "a", "code"),
        ("c1", 2, "u", "code"),
        ("c2", 0, "u", "search"),
        ("c2", 1, "a", "code"),
    ]
    df = spark.createDataFrame(rows, TX_SCHEMA)
    got = {
        (r.prev_tool, r.tool): (r.n_transitions, r.n_convs)
        for r in tool_transitions(df).collect()
    }
    # first turns contribute no transition; search->code occurs in both convs
    assert got == {("search", "code"): (2, 2), ("code", "code"): (1, 1)}


def test_tool_transitions_order_not_input_order(spark):
    # rows arrive shuffled; turn_idx, not input order, defines adjacency
    rows = [
        ("c1", 2, "u", "c"),
        ("c1", 0, "u", "a"),
        ("c1", 1, "a", "b"),
    ]
    df = spark.createDataFrame(rows, TX_SCHEMA)
    got = {(r.prev_tool, r.tool) for r in tool_transitions(df).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_sft_pairs_context_window(spark):
    from biokg_spark.operators.transcripts import sft_pairs

    rows = [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "how"),
        ("c1", 3, "assistant", "fine"),
        ("c1", 4, "user", "ok"),
        ("c1", 5, "assistant", "bye"),
        # assistant turn with no prior context: dropped
        ("c2", 0, "assistant", "orphan"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {r["turn_idx"]: r for r in sft_pairs(df, k=3).collect()}
    assert set(got) == {1, 3, 5}  # c2's orphan dropped
    assert got[1]["context"] == "user: hi" and got[1]["response"] == "hello"
    assert got[3]["context"] == "user: hi\nassistant: hello\nuser: how"
    # k=3 window: turn 5 sees turns 2,3,4 only (turn 0/1 aged out)
    assert got[5]["context"] == "user: how\nassistant: fine\nuser: ok"
    assert got[5]["response"] == "bye"


def test_preference_pairs_best_vs_worst_and_singletons_drop(spark):
    from pyspark.sql import functions as F

    from biokg_spark.operators.transcripts import preference_pairs

    rows = [
        # prompt key "how do" — three candidate responses (3, 1, 5 tokens)
        ("c1", 0, "user", "How do I sort a list"),
        ("c1", 1, "assistant", "use the sorted builtin function"),  # 5
        ("c2", 0, "user", "how   do lists work"),
        ("c2", 1, "assistant", "they are arrays"),  # 3
        ("c3", 0, "user", "How do I reverse"),
        ("c3", 1, "assistant", "reversed"),  # 1
        # singleton prompt key — emits nothing
        ("c4", 0, "user", "what is spark"),
        ("c4", 1, "assistant", "a distributed engine"),
        # assistant turn NOT preceded by a user turn — not a candidate
        ("c5", 0, "assistant", "how do orphan turns behave"),
    ]
    tx = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    score = F.size(F.split(F.trim(F.col("text")), " +")).cast("double")
    got = preference_pairs(tx, score=score, key_width=2).collect()
    assert len(got) == 1
    p = got[0]
    assert p.prompt_key == "how do"
    assert p.n_candidates == 3
    assert p.chosen == "use the sorted builtin function"
    assert p.rejected == "reversed"
    assert (p.chosen_score, p.rejected_score, p.margin) == (5.0, 1.0, 4.0)


def test_preference_pairs_tie_breaks_and_all_tied_group_drops(spark):
    from pyspark.sql import functions as F

    from biokg_spark.operators.transcripts import preference_pairs

    rows = [
        # key "fix bug": scores 3, 3, 1 — chosen must be the LOWEST
        # (conv_id, turn_idx) among the tied maxima, deterministic
        ("a1", 0, "user", "fix bug one"),
        ("a1", 1, "assistant", "try rebooting it"),  # 3
        ("a2", 0, "user", "fix bug two"),
        ("a2", 1, "assistant", "reinstall the package"),  # 3
        ("a3", 0, "user", "fix bug three"),
        ("a3", 1, "assistant", "no"),  # 1
        # key "all tied": every score equal — no preference, emits nothing
        ("b1", 0, "user", "all tied here"),
        ("b1", 1, "assistant", "same length"),  # 2
        ("b2", 0, "user", "all tied there"),
        ("b2", 1, "assistant", "also two"),  # 2
    ]
    tx = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    score = F.size(F.split(F.trim(F.col("text")), " +")).cast("double")
    got = {r.prompt_key: r for r in preference_pairs(tx, score=score).collect()}
    assert set(got) == {"fix bug"}
    p = got["fix bug"]
    assert p.chosen == "try rebooting it"  # a1 < a2 on the tie
    assert p.rejected == "no"
    assert p.margin == 2.0


def test_topic_segments_planted_shift(spark):
    from biokg_spark.operators.transcripts import topic_segments

    rows = [
        ("c1", 0, "cats purr softly"),
        ("c1", 1, "cats nap purr"),
        ("c1", 2, "stocks fell sharply"),   # topic shift here
        ("c1", 3, "stocks rallied sharply"),
    ]
    tx = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {r["turn_idx"]: r for r in topic_segments(tx).collect()}
    # turn 0 has no preceding turn -> not emitted
    assert set(got) == {1, 2, 3}
    # boundary fires exactly at the shift: prev={cats,purr,softly,nap},
    # next={stocks,...} share nothing
    assert got[2]["cohesion"] == 0.0 and bool(got[2]["is_boundary"])
    assert not bool(got[1]["is_boundary"])
    assert not bool(got[3]["is_boundary"])


def test_topic_segments_single_turn_conversations_emit_nothing(spark):
    from biokg_spark.operators.transcripts import topic_segments

    tx = spark.createDataFrame(
        [("a", 0, "hello"), ("b", 0, "world")],
        "conv_id string, turn_idx int, text string",
    )
    assert topic_segments(tx).count() == 0


def test_turn_loops_planted_loop(spark):
    from biokg_spark.operators.transcripts import turn_loops

    rows = [
        ("loopy", 0, "start"),
        ("loopy", 1, "Retrying  now"),   # normalizes equal to the next two
        ("loopy", 2, "retrying now"),
        ("loopy", 3, " retrying NOW "),
        ("loopy", 4, "retrying now!"),   # different (punctuation)
        ("clean", 0, "hello"),
        ("clean", 1, "world"),
        ("clean", 2, "hello"),           # repeat, but NOT consecutive
    ]
    tx = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {r["conv_id"]: r for r in turn_loops(tx).collect()}
    lo = got["loopy"]
    assert (lo["n_turns"], lo["max_run"], lo["n_looped_turns"]) == (5, 3, 3)
    assert bool(lo["is_loop_suspect"])
    cl = got["clean"]
    assert (cl["max_run"], cl["n_looped_turns"], cl["n_distinct_turns"]) == (1, 0, 2)
    assert not bool(cl["is_loop_suspect"])
