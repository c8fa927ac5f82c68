"""Filtered negative sampling (operators/negatives.py).

Checked against a row-at-a-time Python oracle on a links table large
enough that the per-pred entity universes make most corruptions survive
the filter (the registry query's DuckDB twin covers engine parity; this
covers the operator's semantics at a richer scale).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from biokg_spark.operators.negatives import negative_samples


def _links(spark, n_subj=30, n_obj=40):
    """Two predicates with disjoint obj vocabularies; (s, o) linked when
    (s*7 + o) % 5 == 0 — dense enough to filter some candidates."""
    rows = []
    for p, fmt in (("PPI", "P{:03d}"), ("DPI", "T{:03d}")):
        for s in range(n_subj):
            for o in range(n_obj):
                if (s * 7 + o) % 5 == 0:
                    rows.append((fmt.format(100 + s), p, fmt.format(500 + o)))
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _oracle(rows, k=3, corrupt="obj"):
    side = 2 if corrupt == "obj" else 0
    keep = 0 if corrupt == "obj" else 2
    by_pred = {
        p: sorted({r[side] for r in rows if r[1] == p}) for _, p, _ in rows
    }
    true = {(r[keep], r[1], r[side]) for r in rows}
    out = set()
    for s, p, o in rows:
        uni = by_pred[p]
        for ix in range(k):
            h = int(hashlib.md5(f"{s}|{p}|{o}|{ix}".encode()).hexdigest()[:8], 16)
            cand = uni[h % len(uni)]
            kept = (s, p, o)[keep]
            if cand != kept and (kept, p, cand) not in true:
                out.add(
                    (s, p, cand, ix) if corrupt == "obj" else (cand, p, o, ix)
                )
    return out


def test_matches_python_oracle(spark):
    links = _links(spark)
    got = {
        tuple(r)
        for r in negative_samples(links, k=3).collect()
    }
    rows = [tuple(r) for r in links.collect()]
    assert got == _oracle(rows, k=3)
    assert len(got) > 1000  # the filter leaves a substantive sample


def test_filtered_protocol_invariants(spark):
    links = _links(spark)
    negs = negative_samples(links, k=3).cache()
    # no negative is a true triple
    assert (
        negs.join(
            links.withColumnRenamed("obj", "neg_obj"),
            ["subj", "pred", "neg_obj"],
        ).count()
        == 0
    )
    # no self-loops; slot index within [0, k)
    assert negs.where("neg_obj = subj").count() == 0
    assert negs.where("neg_ix < 0 OR neg_ix >= 3").count() == 0
    # every neg_obj comes from its predicate's own obj universe
    uni = links.select("pred", F.col("obj").alias("neg_obj")).distinct()
    assert negs.join(uni, ["pred", "neg_obj"], "left_anti").count() == 0
    # at most k rows per positive slot group
    per_pos = negs.groupBy("subj", "pred").count()
    assert per_pos.agg(F.max("count")).first()[0] <= 3 * 40  # k * max objs/subj


def test_head_corruption_matches_oracle(spark):
    links = _links(spark)
    got = {
        tuple(r) for r in negative_samples(links, k=3, corrupt="subj").collect()
    }
    rows = [tuple(r) for r in links.collect()]
    assert got == _oracle(rows, k=3, corrupt="subj")
    assert len(got) > 1000


def test_both_mode_unions_the_two_sides(spark):
    links = _links(spark)
    both = negative_samples(links, k=2, corrupt="both")
    assert both.columns == ["subj", "pred", "obj", "corrupted", "neg_ix"]
    rows = [tuple(r) for r in links.collect()]
    tails = {
        (s, p, o, "obj", ix) for s, p, o, ix in _oracle(rows, k=2, corrupt="obj")
    }
    heads = {
        (s, p, o, "subj", ix)
        for s, p, o, ix in _oracle(rows, k=2, corrupt="subj")
    }
    assert {tuple(r) for r in both.collect()} == tails | heads


def test_deterministic_across_partitionings(spark):
    links = _links(spark)
    a = set(map(tuple, negative_samples(links, k=2).collect()))
    b = set(
        map(tuple, negative_samples(links.repartition(13), k=2).collect())
    )
    assert a == b
