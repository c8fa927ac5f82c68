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
