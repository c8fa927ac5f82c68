from biokg_spark.operators.components import connected_components, dedup_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = connected_components(df)
    return {r.id: r.component for r in got.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: needs several propagation rounds
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_self_loop(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (7, 7)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_direction_against_min_label(spark):
    # edges oriented so min label must flow "backwards"
    got = _cc(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    assert set(got.values()) == {1}


def test_dedup_clusters_with_lsh_pairs(spark):
    """End-to-end: LSH candidate pairs on documents with planted dups ->
    clusters -> survivors."""
    from pyspark.sql import functions as F

    from biokg_spark.operators.dedup import minhash_lsh_candidates

    base = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),
        (4, "completely different text about spark physical plans and shuffles"),
        (5, "completely different text about spark physical plans and shuffles"),
        (6, "an unrelated singleton document with its own unique words here"),
    ]
    docs = spark.createDataFrame(base, "doc_id long, text string")
    pairs = minhash_lsh_candidates(docs, "text", "doc_id", num_hashes=8, bands=4)
    out = dedup_clusters(pairs)
    rows = {r.id: (r.survivor, r.is_survivor) for r in out.collect()}
    assert rows[1] == (1, True) and rows[2] == (1, False) and rows[3] == (1, False)
    assert rows[4] == (4, True) and rows[5] == (4, False)
    assert 6 not in rows  # isolated: never a candidate, kept by default
    kept = docs.join(
        out.where("NOT is_survivor"), docs.doc_id == F.col("id"), "left_anti"
    )
    assert {r.doc_id for r in kept.collect()} == {1, 4, 6}


def test_long_chain_converges_fast(spark):
    """A 60-hop chain needs ~6 pointer-doubling rounds, far under
    max_iter — plain neighbor-min alone would need 60 and silently
    truncate (the old bug)."""
    edges = [(i, i + 1) for i in range(1, 61)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(df, max_iter=12).collect()}
    assert set(got.values()) == {1} and len(got) == 61


def test_non_convergence_raises(spark):
    edges = [(i, i + 1) for i in range(1, 40)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_scc_hand_built(spark):
    from biokg_spark.operators.components import strongly_connected_components

    e = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "a"),   # 3-cycle
            ("d", "a"),                              # feeds the cycle, alone
            ("c", "e"), ("e", "f"), ("f", "e"),   # 2-cycle downstream
            ("g", "g"),                              # self-loop only
        ],
        "src string, dst string",
    )
    got = {
        r.id: r.scc_id
        for r in strongly_connected_components(e).collect()
    }
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "d": "d", "e": "e", "f": "e", "g": "g",
    }


def test_scc_dag_all_singletons(spark):
    from biokg_spark.operators.components import strongly_connected_components

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], "src string, dst string"
    )
    got = {
        r.id: r.scc_id
        for r in strongly_connected_components(e).collect()
    }
    assert got == {x: x for x in "abcd"}


def test_topo_layers_with_cycle_condensation(spark):
    from biokg_spark.operators.components import topo_layers

    # d -> {a,b,c cycle} -> e -> {f,g cycle}; h isolated source -> e
    e = spark.createDataFrame(
        [
            ("d", "a"), ("a", "b"), ("b", "c"), ("c", "a"),
            ("c", "e"), ("e", "f"), ("f", "g"), ("g", "f"),
            ("h", "e"),
        ],
        "src string, dst string",
    )
    got = {r.id: (r.scc_id, r.layer) for r in topo_layers(e).collect()}
    assert got["d"] == ("d", 0)
    assert got["h"] == ("h", 0)
    assert got["a"] == ("a", 1) and got["b"] == ("a", 1) and got["c"] == ("a", 1)
    assert got["e"] == ("e", 2)
    assert got["f"] == ("f", 3) and got["g"] == ("f", 3)
