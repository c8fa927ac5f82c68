"""Proximity-pair semantics (operators/proximity.py)."""

from __future__ import annotations

from itertools import combinations

from biokg_spark.operators.proximity import proximity_pairs

SCHEMA = "conv_id string, turn_idx int, eid string"


def _run(spark, rows, window):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.e1, r.e2): (r.n_cooc, r.n_convs)
        for r in proximity_pairs(df, window=window).collect()
    }


def test_same_turn_and_cross_turn(spark):
    rows = [
        ("c1", 0, "A"), ("c1", 0, "B"),  # same turn
        ("c1", 2, "C"),                   # 2 turns from A/B: inside w=2
        ("c1", 5, "D"),                   # 3 turns from C: outside
    ]
    got = _run(spark, rows, window=2)
    assert got == {
        ("A", "B"): (1, 1),
        ("A", "C"): (1, 1),
        ("B", "C"): (1, 1),
    }


def test_instance_pairs_counted_once_each(spark):
    # A at turns 0 and 1, B at turn 1: two instance pairs, one conv
    rows = [("c1", 0, "A"), ("c1", 1, "A"), ("c1", 1, "B")]
    assert _run(spark, rows, window=2) == {("A", "B"): (2, 1)}


def test_conversations_do_not_mix(spark):
    rows = [("c1", 0, "A"), ("c2", 0, "B")]
    assert _run(spark, rows, window=2) == {}


def test_duplicate_mentions_dedup(spark):
    rows = [("c1", 0, "A"), ("c1", 0, "A"), ("c1", 0, "B")]
    assert _run(spark, rows, window=1) == {("A", "B"): (1, 1)}


def test_random_vs_bruteforce(spark):
    import random

    for seed in range(3):
        rng = random.Random(seed)
        rows = list(
            {
                (f"c{rng.randrange(3)}", rng.randrange(8),
                 rng.choice("ABCDE"))
                for _ in range(40)
            }
        )
        for w in (1, 3):
            want: dict[tuple[str, str], list] = {}
            for (ca, ta, ea), (cb, tb, eb) in combinations(sorted(rows), 2):
                if ca == cb and ea != eb and abs(ta - tb) <= w:
                    k = (min(ea, eb), max(ea, eb))
                    want.setdefault(k, []).append(ca)
            expect = {
                k: (len(v), len(set(v))) for k, v in want.items()
            }
            assert _run(spark, rows, window=w) == expect, f"{seed} w={w}"
