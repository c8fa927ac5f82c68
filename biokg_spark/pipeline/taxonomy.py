"""The reference's full properties/metadata taxonomy, as data + routing.

The reference compiles per-entity-type property and metadata FILES — one
predicate per file, routed by source and entity type, with unknown
predicates raising at the fan-out writers (reference:
compile_biokg.py:292-314 uniprot annotation fan-out, :969 the raise;
published contract: properties_description.txt:7-306 and
meta_description.txt:8-346). Here the same taxonomy is two per-type
vocabulary maps plus ONE declarative routing step over the ontology dim:
every row lands in the ``properties`` or ``metadata`` family (with TREE /
ATC hierarchy expansion applied in the same pass), and rows outside the
contract surface as a hard error — the Spark analog of the per-file
writer raise.

Scale shape: the ontology is a dim table (broadcast-sized next to the
fact data); routing is pure Column work — literal IN lists over
``entity_type|pred``, no UDFs, no shuffle beyond the final family
partition write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biokg_spark.operators.hierarchy import expand_prefixes

# Per-entity-type PROPERTY predicates — one entry per published property
# file (properties_description.txt:7-306). TREE_PREFIX and DRUG_ATC_CODE
# are emitted by the expansion branches below from raw TREE / ATC rows.
PROPERTY_VOCAB: dict[str, frozenset[str]] = {
    "PROTEIN": frozenset({
        # GO annotations (protein_go_*.txt, properties_description.txt:21-55)
        "GO_BP", "GO_CC", "GO_MF",
        # InterPro sequence-annotation classes
        # (protein/sequence_annotations/*.txt, :59-150)
        "ACTIVE_SITE", "BINDING_SITE", "CONSERVED_SITE", "DOMAIN",
        "FAMILY", "HOMOLOGOUS_SUPERFAMILY", "PTM", "REPEAT",
        # HPA expression (protein_expression.txt, :8-18); the level-
        # qualified form is the expr_quads family
        "PROTEIN_EXPRESSED_IN",
    }),
    "DRUG": frozenset({
        "DRUG_ATC_CODE",                  # drug_atc_codes.txt (:166-176)
        "DRUG_SIDEEFFECT_ASSOCIATION",    # drug_sideeffect.txt (:178-188)
        "DRUG_INDICATION_ASSOCIATION",    # drug_indication.txt (:190-200)
    }),
    "CELL": frozenset({
        "PART_OF_TISSUE",                 # cell_tissue_membership.txt (:202-212)
    }),
    "DISEASE": frozenset({
        "DISEASE_SUPERGRP",               # disease_tree.txt (:214-224)
        "TREE_PREFIX",                    # MeSH tree expansion (engine form)
    }),
    "PATHWAY": frozenset({
        "PATHWAY_CATEGORY",               # pathway_category.txt (:226-236)
        "HAS_PARENT_PATHWAY",             # pathway_parent.txt (:239-249)
        "PATHWAY_GO_BP", "PATHWAY_GO_CC", "PATHWAY_GO_MF",  # (:251-284)
    }),
    "GENETIC_DISORDER": frozenset({
        "CATEGORY",                       # mim_categories.txt (:286-296)
    }),
}

# Per-entity-type METADATA predicates — one entry per published metadata
# file (meta_description.txt:8-346). The reference's uniprot metadata
# fan-out map is compile_biokg.py analog; drugbank taxonomy lines come
# from the ClassyFire-style record sections.
METADATA_VOCAB: dict[str, frozenset[str]] = {
    "PROTEIN": frozenset({
        "NAME", "FULL_NAME", "SHORT_NAME", "ORGANISM_CLASS", "SPECIES",
        "OTHER_ID", "RELATED_KEYWORD", "RELATED_PUBMED_ID",
    }),
    "DRUG": frozenset({
        "NAME", "SYNONYM", "TYPE", "PRODUCT", "PRODUCT_STAGE", "CLASS",
        "DIRECT_PARENT", "ALTERNATIVE_PARENT", "SUPERCLASS", "SUBCLASS",
        "SUBSTITUENT", "KINGDOM", "PUBMED_ARTICLE",
    }),
    "DISEASE": frozenset({"NAME", "TYPE"}),   # mesh_name / mesh_type
    "PATHWAY": frozenset({"NAME"}),           # pathway_names
    "CELL": frozenset({"NAME"}),              # cell_names
}

# flat predicate surface (what _assert_vocabulary closes over)
ALL_PROPERTY_PREDICATES: frozenset[str] = frozenset().union(*PROPERTY_VOCAB.values())
ALL_METADATA_PREDICATES: frozenset[str] = frozenset().union(*METADATA_VOCAB.values())

_PROP_KEYS = sorted(
    f"{t}|{p}" for t, preds in PROPERTY_VOCAB.items() for p in preds
)
_META_KEYS = sorted(
    f"{t}|{p}" for t, preds in METADATA_VOCAB.items() for p in preds
)

# WHO ATC class hierarchy levels: the 1/3/4/5/7-char prefixes (reference
# parsers.py:1036-1049 writes exactly these five).
ATC_LEVELS = (1, 3, 4, 5, 7)


def route_ontology(ontology: DataFrame) -> DataFrame:
    """Route ontology rows into output families, expanding hierarchies.

    Input: ``(entity_id, entity_type, pred, value)``. Output:
    ``(subj, entity_type, pred, obj, family)`` where family is
    'properties' | 'metadata' | NULL (NULL = outside the contract — the
    caller raises, mirroring the reference's fan-out writer raise,
    compile_biokg.py:969).

    - ``TREE`` rows (MeSH tree paths) expand to one TREE_PREFIX row per
      ancestor prefix (reference parsers.py:3073-3083).
    - ``ATC`` rows expand to one DRUG_ATC_CODE row per class level
      (reference parsers.py:1036-1049).
    - everything else routes by the (entity_type, pred) vocabulary.
    """
    base = ontology.where(~F.col("pred").isin("TREE", "ATC")).select(
        F.col("entity_id").alias("subj"),
        "entity_type",
        "pred",
        F.col("value").alias("obj"),
    )
    trees = ontology.where(F.col("pred") == "TREE")
    expanded = expand_prefixes(trees, "value", out_col="prefix").select(
        F.col("entity_id").alias("subj"),
        "entity_type",
        F.lit("TREE_PREFIX").alias("pred"),
        F.col("prefix").alias("obj"),
    )
    atc = ontology.where(F.col("pred") == "ATC").select(
        F.col("entity_id").alias("subj"),
        "entity_type",
        F.lit("DRUG_ATC_CODE").alias("pred"),
        F.explode(
            F.transform(
                F.array(*[F.lit(n) for n in ATC_LEVELS]),
                lambda n: F.concat(F.lit("ATC:"), F.col("value").substr(F.lit(1), n)),
            )
        ).alias("obj"),
    )
    routed = base.unionByName(expanded).unionByName(atc)
    key = F.concat_ws("|", "entity_type", "pred")
    family = (
        F.when(key.isin(_PROP_KEYS), F.lit("properties"))
        .when(key.isin(_META_KEYS), F.lit("metadata"))
        .otherwise(F.lit(None).cast("string"))
    )
    return routed.select("subj", "entity_type", "pred", "obj", family.alias("family"))


def assert_routed(routed: DataFrame) -> None:
    """Raise on any row outside the published taxonomy — one pruned
    limit-1 job over the (dim-sized) routed table."""
    bad = (
        routed.where(F.col("family").isNull())
        .select("entity_type", "pred")
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"Predicate not recognized {bad[0]['pred']!r} for entity type "
            f"{bad[0]['entity_type']!r} (outside the published "
            "properties/metadata taxonomy)"
        )


def top_level_pathways(ontology: DataFrame) -> DataFrame:
    """Pathways with no parent in the pathway hierarchy — the Reactome
    top-level set behind MEMBER_OF_TOP_LEVEL_PATHWAY
    (links_description.txt:176; the reference ships
    complex_top_level_pathway.txt next to complex_pathway.txt:163).

    One column ``pathway_id``. Universe = pathways the ontology knows
    (the hierarchy's own domain, like Reactome's file — and, in the
    pipeline, a scan of the already lineage-truncated dim rather than a
    re-evaluation of the lexicon plan); anti-join against
    HAS_PARENT_PATHWAY subjects. A pathway absent from the ontology
    conservatively stays MEMBER_OF_PATHWAY. Both sides are dims, so the
    join broadcasts.
    """
    universe = (
        ontology.where(F.col("entity_type") == "PATHWAY")
        .select(F.col("entity_id").alias("pathway_id"))
        .dropDuplicates()
    )
    children = ontology.where(F.col("pred") == "HAS_PARENT_PATHWAY").select(
        F.col("entity_id").alias("pathway_id")
    )
    return universe.join(children, "pathway_id", "left_anti")


def routing_sql(rows_cte: str) -> str:
    """DuckDB twin of ``route_ontology`` for the oracle gate, generated
    from the SAME vocabulary tables (the pin test holds an independent
    checked-in copy of the taxonomy, tests/test_taxonomy_contract.py).

    ``rows_cte``: name of a CTE with columns
    (entity_id, entity_type, pred, value).
    """

    def in_list(keys: list[str]) -> str:
        return ",".join(f"'{k}'" for k in keys)

    atc_concat = ",".join(str(n) for n in ATC_LEVELS)
    return f"""
    tree_x AS (
      SELECT entity_id, entity_type, 'TREE_PREFIX' AS pred,
             array_to_string(list_slice(string_split(value, '.'), 1, i), '.') AS obj
      FROM {rows_cte},
           unnest(generate_series(1, len(string_split(value, '.')))) AS t(i)
      WHERE pred = 'TREE'),
    atc_x AS (
      SELECT entity_id, entity_type, 'DRUG_ATC_CODE' AS pred,
             'ATC:' || substr(value, 1, n) AS obj
      FROM {rows_cte}, unnest([{atc_concat}]) AS t(n)
      WHERE pred = 'ATC'),
    routed AS (
      SELECT entity_id, entity_type, pred, value AS obj
      FROM {rows_cte} WHERE pred NOT IN ('TREE', 'ATC')
      UNION ALL SELECT * FROM tree_x
      UNION ALL SELECT * FROM atc_x),
    fam AS (
      SELECT entity_id AS subj, entity_type, pred, obj,
             CASE WHEN entity_type || '|' || pred IN ({in_list(_PROP_KEYS)})
                  THEN 'properties'
                  WHEN entity_type || '|' || pred IN ({in_list(_META_KEYS)})
                  THEN 'metadata' END AS family
      FROM routed)
    """
