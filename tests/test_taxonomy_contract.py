"""Pin the properties/metadata taxonomy against silent drift.

The per-type vocabularies in ``pipeline/taxonomy.py`` carry the
reference's published contract (properties_description.txt:7-306,
meta_description.txt:8-346) — and the registry oracle SQL is GENERATED
from the same tables, so a transcription error would propagate to both
sides of the correctness gate. This file holds an independent checked-in
copy transcribed from the description files, one entry per published
file, and asserts equality with both the engine's tables and the
oracle module's copy (same design as tests/test_cascade_contract.py).
"""

from biokg_spark.pipeline.taxonomy import METADATA_VOCAB, PROPERTY_VOCAB
from tests.oracle_kg import ORACLE_METADATA_VOCAB, ORACLE_PROPERTY_VOCAB

# properties_description.txt — one predicate per published property file:
#   protein_expression(:8), protein_go_biological_process(:21),
#   protein_go_cellular_component(:33), protein_go_molecular_function(:45),
#   sequence_annotations/{active_site(:59), binding_site(:72),
#   conserved_site(:85), domain(:98), family(:110),
#   homologous_superfamily(:123), ptm(:136), repeat(:149)},
#   drug_atc_codes(:163), drug_sideeffect(:177), drug_indication(:190),
#   cell_tissue_membership(:203), disease_tree(:215),
#   pathway_category(:228), pathway_parent(:241),
#   pathway_go_{bp(:254), cc(:267), mf(:280)}, mim_categories(:293)
REFERENCE_PROPERTIES = {
    "PROTEIN": {
        "PROTEIN_EXPRESSED_IN", "GO_BP", "GO_CC", "GO_MF",
        "ACTIVE_SITE", "BINDING_SITE", "CONSERVED_SITE", "DOMAIN",
        "FAMILY", "HOMOLOGOUS_SUPERFAMILY", "PTM", "REPEAT",
    },
    "DRUG": {
        "DRUG_ATC_CODE", "DRUG_SIDEEFFECT_ASSOCIATION",
        "DRUG_INDICATION_ASSOCIATION",
    },
    "CELL": {"PART_OF_TISSUE"},
    # disease_tree publishes DISEASE_SUPERGRP; TREE_PREFIX is the
    # engine's expanded MeSH-tree form (reference parsers.py:3073-3083)
    "DISEASE": {"DISEASE_SUPERGRP", "TREE_PREFIX"},
    "PATHWAY": {
        "PATHWAY_CATEGORY", "HAS_PARENT_PATHWAY",
        "PATHWAY_GO_BP", "PATHWAY_GO_CC", "PATHWAY_GO_MF",
    },
    "GENETIC_DISORDER": {"CATEGORY"},
}

# meta_description.txt — one predicate per published metadata file:
#   uniprot_{name(:9), fullname(:22), shortname(:35), organism_class(:48),
#   fullname[SPECIES](:61), other_ids(:74), related_keywords(:87),
#   related_pubmed_ids(:100)}; drugbank_{name(:126), synonym(:139),
#   type(:152), product(:165), product_stage(:178), class(:191),
#   direct_parent(:204), alternative_parent(:217), superclass(:230),
#   subclass(:243), substituent(:256), kingdom(:269),
#   related_pubmed_ids[PUBMED_ARTICLE](:282)}; mesh_{name(:296),
#   type(:309)}; pathway_names(:322); cell_names(:335)
REFERENCE_METADATA = {
    "PROTEIN": {
        "NAME", "FULL_NAME", "SHORT_NAME", "ORGANISM_CLASS", "SPECIES",
        "OTHER_ID", "RELATED_KEYWORD", "RELATED_PUBMED_ID",
    },
    "DRUG": {
        "NAME", "SYNONYM", "TYPE", "PRODUCT", "PRODUCT_STAGE", "CLASS",
        "DIRECT_PARENT", "ALTERNATIVE_PARENT", "SUPERCLASS", "SUBCLASS",
        "SUBSTITUENT", "KINGDOM", "PUBMED_ARTICLE",
    },
    "DISEASE": {"NAME", "TYPE"},
    "PATHWAY": {"NAME"},
    "CELL": {"NAME"},
}


def test_property_vocab_pinned():
    assert {t: set(v) for t, v in PROPERTY_VOCAB.items()} == REFERENCE_PROPERTIES


def test_metadata_vocab_pinned():
    assert {t: set(v) for t, v in METADATA_VOCAB.items()} == REFERENCE_METADATA


def test_oracle_copies_pinned():
    assert {t: set(v) for t, v in ORACLE_PROPERTY_VOCAB.items()} == REFERENCE_PROPERTIES
    assert {t: set(v) for t, v in ORACLE_METADATA_VOCAB.items()} == REFERENCE_METADATA


def test_link_predicate_names_pinned():
    """The published link vocabulary names the engine emits
    (links_description.txt) — including the two predicates that were
    formerly folded into MEMBER_OF_PATHWAY."""
    from biokg_spark.pipeline.kg import LINK_PREDICATES, PREDICATE_VOCABULARY

    assert LINK_PREDICATES[("PROTEIN", "PATHWAY")][0] == "PROTEIN_PATHWAY_ASSOCIATION"
    assert LINK_PREDICATES[("COMPLEX", "PATHWAY")][0] == "MEMBER_OF_PATHWAY"
    assert "MEMBER_OF_TOP_LEVEL_PATHWAY" in PREDICATE_VOCABULARY
