"""In-engine TransE training (operators/kgembed.py)."""

from __future__ import annotations

import hashlib

from biokg_spark.operators.kgembed import INIT_DEN, LR_DEN, transe_train

TRIPLES = [
    ("P1", "INTERACTS", "P2"),
    ("P2", "INTERACTS", "P3"),
    ("P1", "TREATS", "D1"),
    ("P3", "TREATS", "D1"),
    ("D1", "ASSOC", "P2"),
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_transe(triples, dim=4, epochs=2, margin=1.0):
    """Independent row-at-a-time twin of the operator's exact
    arithmetic (the node2vec test-twin discipline)."""
    ents = sorted({t[0] for t in triples} | {t[2] for t in triples})
    preds = sorted({t[1] for t in triples})
    e = {
        (x, j): (_h60(f"E|{x}|{j}") % (INIT_DEN + 1) - INIT_DEN // 2) / INIT_DEN
        for x in ents
        for j in range(dim)
    }
    r = {
        (p, j): (_h60(f"R|{p}|{j}") % (INIT_DEN + 1) - INIT_DEN // 2) / INIT_DEN
        for p in preds
        for j in range(dim)
    }
    trip = [
        (s, p, o, ents[_h60(f"N|{s}|{p}|{o}") % len(ents)]) for s, p, o in triples
    ]
    sign = lambda x: (x > 0) - (x < 0)  # noqa: E731
    clip = lambda x: max(-1.0, min(1.0, x))  # noqa: E731
    for _ in range(epochs):
        ge: dict = {}
        gr: dict = {}
        for s, p, o, n in trip:
            pdiff = [e[s, j] + r[p, j] - e[o, j] for j in range(dim)]
            ndiff = [e[s, j] + r[p, j] - e[n, j] for j in range(dim)]
            if margin + sum(map(abs, pdiff)) - sum(map(abs, ndiff)) <= 0:
                continue
            for j in range(dim):
                sp, sn = sign(pdiff[j]), sign(ndiff[j])
                ge[s, j] = ge.get((s, j), 0) - (sp - sn)
                ge[o, j] = ge.get((o, j), 0) + sp
                ge[n, j] = ge.get((n, j), 0) - sn
                gr[p, j] = gr.get((p, j), 0) - (sp - sn)
        e = {k: clip(v + ge.get(k, 0) / LR_DEN) for k, v in e.items()}
        r = {k: clip(v + gr.get(k, 0) / LR_DEN) for k, v in r.items()}
    return e, r


def test_transe_matches_python_twin_exactly(spark):
    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    out = transe_train(df, dim=4, epochs=2)
    got_e = {
        (r["id"], r["j"]): r["val"] for r in out.collect() if r["kind"] == "E"
    }
    got_r = {
        (r["id"], r["j"]): r["val"] for r in out.collect() if r["kind"] == "R"
    }
    exp_e, exp_r = _python_transe(TRIPLES)
    assert got_e == exp_e  # bit-exact: dyadic arithmetic, no tolerance
    assert got_r == exp_r


def test_transe_actually_trains(spark):
    # at least one update fired: epochs=2 differs from the init
    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    e2, _ = _python_transe(TRIPLES, epochs=2)
    e0, _ = _python_transe(TRIPLES, epochs=0)
    assert e2 != e0
    got = {
        (r["id"], r["j"]): r["val"]
        for r in transe_train(df, dim=4, epochs=2).collect()
        if r["kind"] == "E"
    }
    assert got == e2


def test_transe_deterministic_across_partitioning(spark):
    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    a = sorted(map(tuple, transe_train(df, dim=4, epochs=1).collect()))
    b = sorted(
        map(tuple, transe_train(df.repartition(5), dim=4, epochs=1).collect())
    )
    assert a == b


def test_transe_self_corruption_is_noop(spark):
    # a single-entity graph forces neg == obj: gradients provably
    # cancel, so training leaves the init untouched
    df = spark.createDataFrame(
        [("A", "SELF", "A")], "subj string, pred string, obj string"
    )
    trained = sorted(map(tuple, transe_train(df, dim=4, epochs=2).collect()))
    init = sorted(map(tuple, transe_train(df, dim=4, epochs=0).collect()))
    assert trained == init


def test_transe_values_clipped(spark):
    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    rows = transe_train(df, dim=4, epochs=3).collect()
    assert all(-1.0 <= r["val"] <= 1.0 for r in rows)
