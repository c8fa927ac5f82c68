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


def test_transe_eval_hand_fixture(spark):
    from biokg_spark.operators.kgembed import transe_eval

    # 1-dim embeddings with hand-computable L1 distances
    emb = spark.createDataFrame(
        [("E", "a", 0, 0.0), ("E", "b", 0, 0.25), ("E", "c", 0, 0.5),
         ("E", "d", 0, 1.0), ("R", "p", 0, 0.25)],
        "kind string, id string, j int, val double",
    )
    train = spark.createDataFrame(
        [("a", "p", "c")], "subj string, pred string, obj string"
    )
    test = spark.createDataFrame(
        [
            ("a", "p", "b"),   # d: a=.25 b=0 d=.75 (c filtered) -> rank 1
            ("a", "p", "a"),   # d: a=.25 b=0 d=.75 -> b beats a -> rank 2
            ("z", "p", "b"),   # unseen subject -> skipped
        ],
        "subj string, pred string, obj string",
    )
    row = transe_eval(emb, train, test, dim=1).collect()[0]
    assert (row["n_test"], row["hits_at_1"], row["hits_at_3"]) == (2, 1, 2)
    assert row["mean_rank"] == 1.5
    assert row["mrr"] == 0.75


def test_transe_eval_filtered_setting_excludes_train_candidates(spark):
    from biokg_spark.operators.kgembed import transe_eval

    # h_s + r_p = 0.25: candidate c (d=0.0) would outrank true b
    # (d=0.25); the train triple (s,p,c) removes it. Candidate s ties
    # b at 0.25 but loses the id tie-break ('s' > 'b') -> rank 1.
    emb = spark.createDataFrame(
        [("E", "s", 0, 0.0), ("E", "b", 0, 0.5), ("E", "c", 0, 0.25),
         ("R", "p", 0, 0.25)],
        "kind string, id string, j int, val double",
    )
    train = spark.createDataFrame(
        [("s", "p", "c")], "subj string, pred string, obj string"
    )
    test = spark.createDataFrame(
        [("s", "p", "b")], "subj string, pred string, obj string"
    )
    row = transe_eval(emb, train, test, dim=1).collect()[0]
    assert (row["n_test"], row["hits_at_1"]) == (1, 1)


def _python_distmult(triples, dim=4, epochs=2, margin=1.0):
    import math

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
    clip = lambda x: max(-1.0, min(1.0, x))  # noqa: E731
    qz = lambda x: math.floor(x * INIT_DEN) / INIT_DEN  # noqa: E731
    for _ in range(epochs):
        ge: dict = {}
        gr: dict = {}
        for s, p, o, n in trip:
            sp = sum(e[s, j] * r[p, j] * e[o, j] for j in range(dim))
            sn = sum(e[s, j] * r[p, j] * e[n, j] for j in range(dim))
            if margin - sp + sn <= 0:
                continue
            for j in range(dim):
                hv, rv, tv, nv = e[s, j], r[p, j], e[o, j], e[n, j]
                ge[s, j] = ge.get((s, j), 0.0) + (rv * tv - rv * nv)
                ge[o, j] = ge.get((o, j), 0.0) + hv * rv
                ge[n, j] = ge.get((n, j), 0.0) - hv * rv
                gr[p, j] = gr.get((p, j), 0.0) + (hv * tv - hv * nv)
        e = {k: qz(clip(v + ge.get(k, 0.0) / LR_DEN)) for k, v in e.items()}
        r = {k: qz(clip(v + gr.get(k, 0.0) / LR_DEN)) for k, v in r.items()}
    return e, r


def test_distmult_matches_python_twin_exactly(spark):
    from biokg_spark.operators.kgembed import distmult_train

    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    out = distmult_train(df, dim=4, epochs=2).collect()
    got_e = {(r["id"], r["j"]): r["val"] for r in out if r["kind"] == "E"}
    got_r = {(r["id"], r["j"]): r["val"] for r in out if r["kind"] == "R"}
    exp_e, exp_r = _python_distmult(TRIPLES)
    assert got_e == exp_e  # bit-exact: quantized-SGD grid arithmetic
    assert got_r == exp_r
    # quantization invariant: every value sits on the 1/256 grid
    assert all(v * 256 == int(v * 256) for v in got_e.values())


def test_distmult_deterministic_across_partitioning(spark):
    from biokg_spark.operators.kgembed import distmult_train

    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    a = sorted(map(tuple, distmult_train(df, dim=4, epochs=1).collect()))
    b = sorted(
        map(tuple, distmult_train(df.repartition(5), dim=4, epochs=1).collect())
    )
    assert a == b
