from pyspark.sql import functions as F

from biokg_spark.datagen import entity_lexicon, id_mapping
from biokg_spark.operators.canonicalize import (
    char_shingles,
    derive_id_mapping_lsh,
    fuzzy_canonicalize,
)


def test_char_shingles(spark):
    df = spark.createDataFrame([("Hello",), ("ab",)], "s string")
    got = {r.s: r.g for r in df.select("s", char_shingles("s").alias("g")).collect()}
    assert got["Hello"] == ["hel", "ell", "llo"]
    assert got["ab"] == ["ab"]  # shorter than width -> whole string


def test_fuzzy_canonicalize_typo_variants(spark):
    canon = spark.createDataFrame(
        [("aspirin", "DB001", "DRUG"), ("ibuprofen", "DB002", "DRUG"),
         ("paracetamol", "DB003", "DRUG")],
        "surface string, entity_id string, entity_type string",
    )
    alts = spark.createDataFrame(
        [("aspirinum",), ("ibuprofenx",), ("zzzzqqq",)], "surface string"
    )
    got = {r.alt_surface: r.entity_id for r in fuzzy_canonicalize(alts, canon).collect()}
    assert got.get("aspirinum") == "DB001"
    assert got.get("ibuprofenx") == "DB002"
    assert "zzzzqqq" not in got  # below threshold -> unmatched


def test_lsh_mapping_recovers_curated_11_rows(spark):
    """The derived mapping must recover every 1:1 row of the curated dim
    (the curated table's 1:N fan-out rows are extra knowledge similarity
    cannot invent — the reference keeps those curated; north star replaces
    the 1:1 surface-variant bulk)."""
    lex = entity_lexicon(spark)
    derived = {
        (r.src_id, r.dst_id) for r in derive_id_mapping_lsh(lex).collect()
    }
    # only alts that HAVE a surface form can be derived by similarity; the
    # curated table also covers surface-less ids (extra curated knowledge)
    alt_ids_with_surface = {
        r.entity_id for r in lex.where("priority > 0").collect()
    }
    curated_11 = {
        (r.src_id, r.dst_id)
        for r in id_mapping(spark).collect()
        if r.src_id == f"ALT:{r.dst_id}" and r.src_id in alt_ids_with_surface
    }
    missing = curated_11 - derived
    assert not missing, f"derived mapping missed {sorted(missing)[:5]}"
    # and nothing maps to a wrong entity
    wrong = {
        (s, d) for (s, d) in derived if s.startswith("ALT:") and s != f"ALT:{d}"
    }
    assert not wrong, sorted(wrong)[:5]


def test_pipeline_lsh_canonicalizer_end_to_end(spark, tmp_path):
    from biokg_spark.datagen import ontology, transcripts
    from biokg_spark.pipeline import KGPipeline

    tx = transcripts(spark, n_conversations=40)
    lex = entity_lexicon(spark)
    exact = KGPipeline(
        spark, str(tmp_path / "exact"), lex, id_mapping(spark), ontology(spark)
    ).run(tx, run_key="t")
    lsh = KGPipeline(
        spark, str(tmp_path / "lsh"), lex, None, ontology(spark),
        canonicalizer="lsh",
    ).run(tx, run_key="t")
    # the curated dim has deliberate 1:N fan-out rows the LSH path cannot
    # derive; restricted to 1:1 mappings the two canonicalizations agree
    extra_targets = {
        r.dst_id
        for r in id_mapping(spark).collect()
        if r.src_id != f"ALT:{r.dst_id}"  # the 1:N extra-knowledge rows
    }
    def links_of(out):
        return {(r.subj, r.pred, r.obj) for r in out["links"].collect()}
    exact_links = links_of(exact)
    lsh_links = links_of(lsh)
    assert lsh_links and lsh_links <= exact_links
    # every divergence must touch a curated fan-out target entity
    for s, _p, o in exact_links - lsh_links:
        assert s in extra_targets or o in extra_targets, (s, o)


def test_lsh_mapping_is_functional_per_src_id(spark):
    """Two alternate surfaces sharing one src_id that match DIFFERENT
    canonical surfaces must resolve to ONE dst_id (best jaccard, then
    smallest dst_id) — a multi-valued mapping would duplicate every
    downstream mention of the entity."""
    lex = spark.createDataFrame(
        [
            ("glucokinase", "P10", "PROTEIN", 0),
            ("hexokinase", "P20", "PROTEIN", 0),
            # both alts carry the SAME src entity id
            ("glucokinasez", "ALT:P10", "PROTEIN", 1),
            ("hexokinasez", "ALT:P10", "PROTEIN", 1),
        ],
        "surface string, entity_id string, entity_type string, priority int",
    )
    out = derive_id_mapping_lsh(lex, threshold=0.3).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.src_id, []).append(r.dst_id)
    assert all(len(v) == 1 for v in by_src.values()), by_src
