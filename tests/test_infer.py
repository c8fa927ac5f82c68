"""Metapath inference semantics (operators/infer.py)."""

from __future__ import annotations

from biokg_spark.operators.infer import metapath_infer


def _links(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


BASE = [
    ("d1", "DPI", "p1"),
    ("d1", "DPI", "p2"),
    ("d2", "DPI", "p1"),
    ("p1", "PDA", "x1"),
    ("p2", "PDA", "x1"),
    ("p1", "PDA", "x2"),
    # d2-x2 asserted directly: must be excluded / flagged not-novel
    ("d2", "DRUG_DISEASE_ASSOCIATION", "x2"),
]


def test_metapath_counts_and_exclusion(spark):
    got = {
        (r.subj, r.pred, r.obj): r.n_paths
        for r in metapath_infer(
            _links(spark, BASE), "DPI", "PDA", "IDD"
        ).collect()
    }
    # d1: p1,p2 both reach x1 (2 paths); p1 reaches x2 (1 path)
    # d2: p1 reaches x1 and x2, but d2-x2 is direct -> excluded
    assert got == {
        ("d1", "IDD", "x1"): 2,
        ("d1", "IDD", "x2"): 1,
        ("d2", "IDD", "x1"): 1,
    }


def test_metapath_flag_novel_keeps_direct(spark):
    got = {
        (r.subj, r.obj): (r.n_paths, r.is_novel)
        for r in metapath_infer(
            _links(spark, BASE), "DPI", "PDA", "IDD", flag_novel=True
        ).collect()
    }
    assert got[("d2", "x2")] == (1, 0)
    assert got[("d1", "x1")] == (2, 1)
    assert len(got) == 4


def test_metapath_hub_guard_drops_high_degree_mid(spark):
    # p1 has degree 2 on BOTH legs (drugs d1,d2; diseases x1,x2); cap 1
    # removes every p1 path, leaving only d1-p2-x1
    got = {
        (r.subj, r.obj)
        for r in metapath_infer(
            _links(spark, BASE), "DPI", "PDA", "IDD", max_mid_degree=1
        ).collect()
    }
    assert got == {("d1", "x1")}
    # cap 2 keeps everything (max degree is exactly 2)
    all_pairs = {
        (r.subj, r.obj)
        for r in metapath_infer(
            _links(spark, BASE), "DPI", "PDA", "IDD", max_mid_degree=2
        ).collect()
    }
    assert all_pairs == {("d1", "x1"), ("d1", "x2"), ("d2", "x1")}


def test_node_jaccard_hand_computed(spark):
    from biokg_spark.operators.infer import node_jaccard

    # undirected star+triangle: a-{x,y,z}, b-{x,y}, c-{z}
    edges = []
    for n, nbs in [("a", "xyz"), ("b", "xy"), ("c", "z")]:
        for nb in nbs:
            edges += [(n, nb), (nb, n)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r.a, r.b): (r.n_shared, round(r.jaccard, 6))
        for r in node_jaccard(df).collect()
    }
    # N(a)={x,y,z}, N(b)={x,y}: shared 2, union 3 -> 2/3
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    # N(a), N(c)={z}: shared 1, union 3 -> 1/3
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    # x,y share neighbors {a,b}: 2/2 = 1.0 ... and z-x/z-y share {a}
    assert got[("x", "y")] == (2, 1.0)
    assert ("b", "c") not in got  # no shared neighbor


def test_node_jaccard_hub_guard(spark):
    from biokg_spark.operators.infer import node_jaccard

    # hub neighbor h touches 3 nodes; cap 2 removes all h-mediated pairs
    edges = [("a", "h"), ("b", "h"), ("c", "h"), ("a", "u"), ("b", "u")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.a, r.b) for r in node_jaccard(df, max_neighbor_degree=2).collect()}
    assert got == {("a", "b")}  # only the u-mediated pair survives


def test_metapath_self_pair_dropped(spark):
    rows = [("e1", "A", "m1"), ("m1", "B", "e1"), ("m1", "B", "e2")]
    got = {
        (r.subj, r.obj)
        for r in metapath_infer(_links(spark, rows), "A", "B", "C").collect()
    }
    assert got == {("e1", "e2")}


def test_linkpred_auc_hand_computed(spark):
    from biokg_spark.operators.infer import linkpred_auc

    scored = spark.createDataFrame(
        [
            ("a", "b", 0.9),   # positive
            ("a", "c", 0.5),   # positive, tied with a negative
            ("b", "c", 0.5),   # negative (tie -> 0.5 credit)
            ("b", "d", 0.1),   # negative
            ("c", "d", 0.2),   # negative
            ("x", "y", 1.0),   # training edge: excluded entirely
        ],
        "a string, b string, jaccard double",
    )
    pos = spark.createDataFrame([("a", "b"), ("a", "c")], "a string, b string")
    train = spark.createDataFrame([("x", "y")], "a string, b string")
    r = linkpred_auc(scored, pos, exclude=train).collect()[0]
    # pairs: 0.9 beats 3 negs (3) + 0.5 ties one (0.5) beats two (2) = 5.5/6
    assert (r.n_pos, r.n_neg) == (2, 3)
    assert r.auc == round(5.5 / 6, 4)


def test_linkpred_auc_degenerate_classes(spark):
    from biokg_spark.operators.infer import linkpred_auc

    scored = spark.createDataFrame(
        [("a", "b", 0.9)], "a string, b string, jaccard double"
    )
    no_pos = spark.createDataFrame([], "a string, b string")
    r = linkpred_auc(scored, no_pos).collect()
    assert len(r) == 1 and r[0].auc is None and r[0].n_neg == 1
