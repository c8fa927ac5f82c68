from __future__ import annotations

from biokg_spark.operators.edges import (
    canonical_undirected,
    conflict_exclusion,
    union_refs,
)


def test_canonical_undirected(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("c", "c"), ("a", "z")], "subj string, obj string"
    )
    got = {(r.subj, r.obj) for r in canonical_undirected(df).collect()}
    assert got == {("a", "b"), ("c", "c"), ("a", "z")}


def test_conflict_exclusion(spark):
    df = spark.createDataFrame(
        [
            ("d1", "p1", "INCREASES"),
            ("d1", "p1", "DECREASES"),  # conflict → dropped
            ("d2", "p1", "INCREASES"),
            ("d2", "p1", "INCREASES"),
            ("d3", "p2", "DECREASES"),
        ],
        "drug string, prot string, effect string",
    )
    got = {
        (r.drug, r.prot, r.effect)
        for r in conflict_exclusion(df, ["drug", "prot"], "effect").collect()
    }
    assert got == {("d2", "p1", "INCREASES"), ("d3", "p2", "DECREASES")}


def test_union_refs_array_input(spark):
    df = spark.createDataFrame(
        [
            ("a", "b", ["1", "2"]),
            ("a", "b", ["2", "3", "unassigned"]),
            ("x", "y", ["unassigned"]),  # empties out → dropped
        ],
        "s string, o string, pmids array<string>",
    )
    rows = union_refs(df, ["s", "o"]).collect()
    assert len(rows) == 1
    assert rows[0].s == "a" and rows[0].refs == ["1", "2", "3"]


def test_union_refs_comma_string_input(spark):
    df = spark.createDataFrame(
        [("a", "b", "5,1"), ("a", "b", "1,9")], "s string, o string, pmids string"
    )
    rows = union_refs(df, ["s", "o"]).collect()
    assert rows[0].refs == ["1", "5", "9"]


def test_links_typing_dim_join_semantics(spark):
    """The broadcast-dim pair typing (pipeline/kg.py) preserves the CASE
    chain contract it replaced: directed predicates orient by the
    vocabulary's subject type REGARDLESS of input order, undirected ones
    canonicalize to (least, greatest), and pairs with no vocabulary
    entry drop."""
    from pyspark.sql import functions as F

    from biokg_spark.pipeline.kg import links_from_entity_sets

    def ts(*ents):
        ms = sorted([{"eid": e, "entity_type": t} for e, t in ents],
                    key=lambda m: (m["eid"], m["entity_type"]))
        return spark.createDataFrame(
            [("c", 0, ms)],
            "conv_id string, turn_idx int, ms array<struct<eid:string,entity_type:string>>",
        )

    def links(*ents):
        return {(r.subj, r.pred, r.obj)
                for r in links_from_entity_sets(ts(*ents)).collect()}

    # directed: DRUG is DPI's subject type whichever side sorts first
    assert links(("zz9", "DRUG"), ("aa1", "PROTEIN")) == {("zz9", "DPI", "aa1")}
    assert links(("aa1", "DRUG"), ("zz9", "PROTEIN")) == {("aa1", "DPI", "zz9")}
    # undirected: canonical (least, greatest) independent of type order
    assert links(("q2", "PROTEIN"), ("q1", "PROTEIN")) == {("q1", "PPI", "q2")}
    # untyped combination drops (no GENETIC_DISORDER x PATHWAY predicate)
    assert links(("g1", "GENETIC_DISORDER"), ("p1", "PATHWAY")) == set()
    # top_level refine still applies after the dim join
    tl = spark.createDataFrame([("pw1",)], "pathway_id string")
    got = {(r.subj, r.pred, r.obj) for r in links_from_entity_sets(
        ts(("cx1", "COMPLEX"), ("pw1", "PATHWAY")), top_level=tl).collect()}
    assert got == {("cx1", "MEMBER_OF_TOP_LEVEL_PATHWAY", "pw1")}


def test_edge_provenance_support_and_extent(spark):
    """edge_provenance: n_support = number of turns where the pair
    co-occurs (per-turn duplicate mentions collapse), n_convs = distinct
    conversations, first/last_seen = temporal extent; orientation follows
    the link vocabulary regardless of mention order."""
    from biokg_spark.pipeline.kg import edge_provenance

    rows = [
        # conv A turn 0 (ts 10): p1+p2 PPI, plus a duplicate p1 mention
        ("A", 0, 10, "p1", "PROTEIN"),
        ("A", 0, 10, "p1", "PROTEIN"),
        ("A", 0, 10, "p2", "PROTEIN"),
        # conv A turn 1 (ts 20): same pair again, reversed mention order
        ("A", 1, 20, "p2", "PROTEIN"),
        ("A", 1, 20, "p1", "PROTEIN"),
        # conv B turn 0 (ts 5): same pair, plus a DPI with drug sorted last
        ("B", 0, 5, "p1", "PROTEIN"),
        ("B", 0, 5, "p2", "PROTEIN"),
        ("B", 0, 5, "zz", "DRUG"),
        # conv B turn 1 (ts 99): lone mention — no edge
        ("B", 1, 99, "p1", "PROTEIN"),
    ]
    ents = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, t long, eid string, entity_type string"
    )
    got = {
        (r.subj, r.pred, r.obj): (r.n_support, r.n_convs, r.first_seen, r.last_seen)
        for r in edge_provenance(ents, ["conv_id", "turn_idx"], ts_col="t").collect()
    }
    assert got[("p1", "PPI", "p2")] == (3, 2, 5, 20)
    # DPI oriented drug-first even though 'zz' sorts after the proteins
    assert got[("zz", "DPI", "p1")] == (1, 1, 5, 5)
    assert got[("zz", "DPI", "p2")] == (1, 1, 5, 5)
    assert len(got) == 3


def test_pmi_links_hand_computed(spark):
    """pmi = ln(n_pair * N / (n_a * n_b)) with N including mention-free
    turns; duplicate per-turn mentions collapse before counting."""
    import math

    from biokg_spark.pipeline.kg import pmi_links

    rows = [
        ("A", 0, "p1", "PROTEIN"),
        ("A", 0, "p1", "PROTEIN"),  # dup mention, must not inflate n_ent
        ("A", 0, "p2", "PROTEIN"),
        ("A", 1, "p1", "PROTEIN"),
        ("A", 1, "p2", "PROTEIN"),
        ("B", 0, "p1", "PROTEIN"),
    ]
    ents = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, eid string, entity_type string"
    )
    # N=10 turns total; n_p1=3, n_p2=2, n_pair=2
    got = {
        (r.subj, r.pred, r.obj): (r.n_pair, r.pmi)
        for r in pmi_links(ents, ["conv_id", "turn_idx"], n_groups=10).collect()
    }
    n_pair, pmi = got[("p1", "PPI", "p2")]
    assert n_pair == 2
    assert abs(pmi - math.log(2 * 10 / (3 * 2))) < 1e-12
    assert len(got) == 1


def test_entity_vocab_frequency_rank(spark):
    from biokg_spark.pipeline.kg import entity_vocab

    occ = spark.createDataFrame(
        [("A", 0, "x"), ("A", 1, "x"), ("A", 0, "y"),
         ("B", 0, "y"), ("B", 1, "z")],
        "conv_id string, turn_idx int, eid string",
    )
    got = {r.entity_id: (r.n_mentions, r.vocab_id)
           for r in entity_vocab(occ).collect()}
    # x and y tie at 2 -> id order breaks the tie; z last
    assert got == {"x": (2, 0), "y": (2, 1), "z": (1, 2)}


def test_schema_audit_catches_violations(spark):
    from biokg_spark.operators.edges import schema_audit
    from pyspark.sql import functions as F  # noqa: F811

    contract = spark.createDataFrame(
        [("PPI", "PROTEIN", "PROTEIN", True), ("DPI", "DRUG", "PROTEIN", False)],
        "pred string, subj_type string, obj_type string, undirected boolean",
    )
    types = spark.createDataFrame(
        [("p1", "PROTEIN"), ("p2", "PROTEIN"), ("d1", "DRUG")],
        "entity_id string, entity_type string",
    )
    triples = spark.createDataFrame(
        [
            ("p1", "PPI", "p2"),   # valid (canonical: p1 <= p2)
            ("p2", "PPI", "p1"),   # bad orientation (undirected, subj > obj)
            ("d1", "DPI", "p1"),   # valid directed
            ("p1", "DPI", "d1"),   # bad pair: (PROTEIN, DRUG) not licensed
            ("d1", "DPI", "zz"),   # unknown obj (also bad pair: null type)
        ],
        "subj string, pred string, obj string",
    )
    rep = {r["pred"]: r for r in schema_audit(triples, types, contract).collect()}
    ppi, dpi = rep["PPI"], rep["DPI"]
    assert ppi["n"] == 2 and ppi["n_valid"] == 1 and ppi["n_bad_orient"] == 1
    assert dpi["n"] == 3 and dpi["n_valid"] == 1
    assert dpi["n_bad_pair"] == 2 and dpi["n_unknown_obj"] == 1


def test_schema_audit_dedups_dirty_type_map(spark):
    from biokg_spark.operators.edges import schema_audit

    contract = spark.createDataFrame(
        [("DPI", "DRUG", "PROTEIN", False)],
        "pred string, subj_type string, obj_type string, undirected boolean",
    )
    # d1 carries a conflicting duplicate type row: audit must not fan out
    types = spark.createDataFrame(
        [("d1", "DRUG"), ("d1", "PROTEIN"), ("p1", "PROTEIN")],
        "entity_id string, entity_type string",
    )
    triples = spark.createDataFrame(
        [("d1", "DPI", "p1")], "subj string, pred string, obj string"
    )
    rows = schema_audit(triples, types, contract).collect()
    assert len(rows) == 1 and rows[0]["n"] == 1  # one row in, one counted
