"""Deterministic, fully distributed synthetic data (FIXTURES.md schemas).

The reference downloads 15+ public biomedical sources (reference:
sources.ini:4-85, biokg/loader.py:10-310). This sandbox forbids network and
external data, so the pipeline's inputs are synthesized *inside Spark*:
``spark.range`` plus md5-derived indices — no driver-side loops, no Python
RNG, byte-stable across runs and across parallelism levels (the bench
harness depends on identical input at local[8] and local[32]).

Tables produced:
- ``transcripts(conv_id, turn_idx, role, text, tool, ts)`` — the primary
  input per BASELINE.json input_hint.
- ``entity_lexicon(surface, entity_id, entity_type, priority)`` — analog of
  the reference's name/synonym metadata (reference:
  summarize_preprocessed.py:59-63, parsers.py:1099-1102).
- ``id_mapping(src_id, src_ns, dst_id, dst_ns)`` — analog of
  chemical_drugbank.txt.gz and the biodblinker tables (reference:
  compile_biokg.py:1-9, parsers.py:1827-1876).
- ``ontology(entity_id, pred, value)`` — analog of MeSH tree / metadata
  dims (reference: parsers.py:3073-3083, compile_biokg.py:1042-1059).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ~100 filler words that never collide with lexicon surfaces.
_FILLER = """
the a of to and in that it is was for on are as with his they at be this
have from or had by hot word but what some we can out other were all there
when up use your how said an each she which do their time if will way about
many then them write would like so these her long make thing see him two has
look more day could go come did number sound no most people my over know
water than call first who may down side been now find any new work part take
get place made live where after back little only round man year came show
every good me give our under name very through just form sentence great
think say help low line differ turn cause much mean before move right boy
old too same tell does set three want air well also play small end put home
read hand port large spell add even land here must big high such follow act
why ask men change went light kind off need house picture try us again
animal point mother world near build self earth father
""".split()

# Entity-type registry: (type, id prefix, surface stem, count).
# Mirrors the reference's namespaced-ID scheme (SURVEY.md §1.1): UniProt-ish
# P#####, DrugBank-ish DB#####, MeSH-ish D######, Reactome-ish R-HSA-#.
_ENTITY_TYPES = [
    ("PROTEIN", "P%05d", "protkin%d", 40),
    ("DRUG", "DB%05d", "drugamab%d", 30),
    ("DISEASE", "D%06d", "carcinitis%d", 20),
    ("PATHWAY", "R-HSA-%d", "pathglyco%d", 10),
    # Reactome-ish complexes and OMIM-ish genetic disorders — the entity
    # classes behind the reference's MEMBER_OF_COMPLEX /
    # DISEASE_GENETIC_DISORDER / RELATED_GENETIC_DISORDER link files
    # (links_description.txt:73-205); MIM: ids match the reference's
    # P_DISEASE_CODE regex (parsers.py:15).
    ("COMPLEX", "R-HSA-C%d", "complexome%d", 12),
    ("GENETIC_DISORDER", "MIM:%06d", "omimopathy%d", 15),
]

# Reference-shaped DDI interaction descriptions (reference:
# biokg/processing/parsers.py:24-45). Each template carries two drug-surface
# slots; together they exercise every pattern of the 15-pattern cascade,
# the ', and'/' and ' list forms, the 'activities' suffix handling and the
# DDI_SE_ALIASES map (including sentences whose nominal pattern is shadowed
# by an earlier one — faithful first-match-wins behavior).
DDI_SENTENCES: list[str] = [
    "The risk or severity of hypertension can be increased when %s is combined with %s.",
    "The risk or severity of nausea, vomiting, and headache can be increased when %s is combined with %s.",
    "The risk or severity of sedative activities and hypotensive activities can be decreased when %s is combined with %s.",
    "The risk or severity of hyperkalemic activities can be increased when %s is combined with %s.",
    "%s may decrease effectiveness of %s as a diagnostic agent.",
    "The metabolism of %s can be decreased when used in combination with %s.",
    "The serum concentration of %s can be increased when it is combined with %s.",
    "%s can cause a decrease in the absorption of %s resulting in a reduced serum concentration and potentially a decrease in efficacy.",
    "%s may decrease the excretion rate of %s which could result in a higher serum level.",
    "%s may increase the excretion rate of %s which could result in a lower serum level and potentially a reduction in efficacy.",
    "The bioavailability of %s can be decreased when combined with %s.",
    "%s can cause an increase in the absorption of %s resulting in an increased serum concentration and potentially a worsening of adverse effects.",
    "The risk of a hypersensitivity reaction to %s is increased when it is combined with %s.",
    "The therapeutic efficacy of %s can be decreased when combined with %s.",
    "The serum concentration of the active metabolites of %s can be increased when it is used in combination with %s.",
    "The serum concentration of %s, an active metabolite of deferiprone can be increased when used in combination with %s.",
    "%s may increase the cardiotoxic activities of %s.",
    "%s may increase the central nervous system depressant (CNS depressant) activities of %s.",
    "%s may increase the QTc-prolonging activities of %s.",
    "%s may decrease the neuromuscular blocking activities of %s.",
    "The risk or severity of hypoglycemia can be decreased when %s is combined with %s.",
]

# Drug-protein relation cues (reference: targets/enzymes/carriers/
# transporters sections with actions, parsers.py:1143-1152 + :904-925; the
# last two mirror CTD's INCREASES/DECREASES_EXPRESSION effect rows used by
# build_benchmarks.py:94-106).
ACTION_SENTENCES: list[tuple[str, str, str]] = [
    ("%s inhibits %s", "DRUG_TARGET", "inhibitor"),
    ("%s activates %s", "DRUG_TARGET", "activator"),
    ("%s binds %s", "DRUG_TARGET", "unknown"),
    ("%s is metabolized by %s", "DRUG_ENZYME", "substrate"),
    ("%s is transported by %s", "DRUG_TRANSPORTER", "substrate"),
    ("%s is carried by %s", "DRUG_CARRIER", "substrate"),
    ("%s increases expression of %s", "DPI", "increases_expression"),
    ("%s decreases expression of %s", "DPI", "decreases_expression"),
]

TISSUES = ["liver", "kidney", "lung", "brain", "heart"]
EXPRESSION_LEVELS = ["low", "medium", "high"]
ORGANISMS = ["human", "mouse", "rat"]
PHOS_SITES = ["Y27", "S15", "T308", "S473", "Y416"]

# Deterministic uniform integer in [0, n) derived from md5 of the key cols.
# conv(hex, 16, 10) is exact for 8 hex digits (< 2^32), JVM-side throughout.


def _h(n: int | Column, *cols: Column | str) -> Column:
    key = F.concat_ws("", *[F.col(c) if isinstance(c, str) else c for c in cols])
    v = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return F.pmod(v, F.lit(n) if isinstance(n, int) else n)


def entity_lexicon(spark: SparkSession) -> DataFrame:
    """Surface→entity dictionary with synonyms and priority tie-breaks.

    Each entity gets a primary surface (``protkin7``) carrying its
    canonical id, and every third entity an extra synonym (``protkin7x``)
    carrying the raw ``ALT:``-namespace id — the link stage must resolve
    those through ``id_mapping`` (the reference resolves raw ids through
    biodblinker tables, compile_biokg.py:345-346). One ambiguous surface
    maps to two entities with different priorities — exercising the
    reference's first-match-wins semantics (reference: parsers.py:976).
    """
    parts = []
    # dim tables: single-partition ranges — a 32-partition range per union
    # branch puts 400+ near-empty tasks into EVERY consumer job (broadcast
    # builds, driver collects); one partition per branch is the dim shape
    for etype, id_fmt, stem, count in _ENTITY_TYPES:
        base = spark.range(count, numPartitions=1).select(
            F.format_string(id_fmt, F.col("id") + 1).alias("entity_id"),
            F.format_string(stem, F.col("id") + 1).alias("surface"),
            F.lit(etype).alias("entity_type"),
            F.lit(0).alias("priority"),
        )
        syn = (
            spark.range(count, numPartitions=1)
            .where(F.col("id") % 3 == 0)
            .select(
                F.concat(F.lit("ALT:"), F.format_string(id_fmt, F.col("id") + 1)).alias(
                    "entity_id"
                ),
                F.concat(F.format_string(stem, F.col("id") + 1), F.lit("x")).alias(
                    "surface"
                ),
                F.lit(etype).alias("entity_type"),
                F.lit(1).alias("priority"),
            )
        )
        parts.append(base)
        parts.append(syn)
    lex = parts[0]
    for p in parts[1:]:
        lex = lex.unionByName(p)
    # ambiguous surface: "ambigterm" → first (by priority) a PROTEIN, then a DRUG
    ambig = spark.createDataFrame(
        [
            ("ambigterm", "P00001", "PROTEIN", 0),
            ("ambigterm", "DB00001", "DRUG", 1),
        ],
        "surface string, entity_id string, entity_type string, priority int",
    )
    return lex.unionByName(ambig).select("surface", "entity_id", "entity_type", "priority")


def id_mapping(spark: SparkSession) -> DataFrame:
    """Cross-namespace ID translation dim (1:1 and 1:N rows).

    Analog of the bundled CTD-chemical→DrugBank map where one src id can
    map to several canonical ids, exploded on join (reference:
    parsers.py:1970-1988).
    """
    rows = []
    for etype, id_fmt, _stem, count in _ENTITY_TYPES:
        for i in range(1, count + 1):
            raw = id_fmt % i
            rows.append((f"ALT:{raw}", f"ALT_{etype}", raw, etype))
            if i % 7 == 0:  # 1:N fan-out
                rows.append((f"ALT:{raw}", f"ALT_{etype}", id_fmt % (i % count + 1), etype))
    return spark.createDataFrame(
        rows, "src_id string, src_ns string, dst_id string, dst_ns string"
    )


# Value tables for the ontology dim — deterministic picks by md5 hash.
# Each mirrors one published vocabulary (properties_description.txt /
# meta_description.txt); the class lists are representative members.
INTERPRO_CLASSES = [
    "DOMAIN", "FAMILY", "ACTIVE_SITE", "BINDING_SITE", "CONSERVED_SITE",
    "HOMOLOGOUS_SUPERFAMILY", "PTM", "REPEAT",
]
ORGANISM_CLASS_TAILS = ["Metazoa", "Fungi", "Viridiplantae", "Chordata"]
SPECIES_NAMES = ["HUMAN", "MOUSE", "RAT"]
PROTEIN_KEYWORDS = ["Kinase", "Transferase", "Membrane", "Cytoplasm", "ATP-binding"]
DRUG_TYPES = ["small molecule", "biotech"]
PRODUCT_STAGES = ["approved", "experimental", "nutraceutical"]
CHEM_CLASSES = ["Benzenoids", "Organoheterocyclic compounds", "Lipids", "Organic acids"]
CHEM_SUBSTITUENTS = ["Aromatic ring", "Carboxylic acid", "Hydroxyl group", "Amine"]
PATHWAY_CATEGORIES = ["signaling", "metabolic", "disease", "drug_action"]
MIM_CATEGORIES = ["Autosomal dominant", "Autosomal recessive", "X-linked", "Somatic"]


# Plan-construction memo: building the ontology's Column tree costs ~3 s
# of driver-side py4j round trips (hundreds of expression objects); the
# resulting DataFrame is an immutable plan, safe to reuse within a
# session. Keyed on the session object so a fresh session rebuilds.
_ONTOLOGY_MEMO: dict[int, DataFrame] = {}


def ontology(spark: SparkSession) -> DataFrame:
    key = id(spark)
    if key not in _ONTOLOGY_MEMO:
        _ONTOLOGY_MEMO.clear()  # one live session at a time in practice
        _ONTOLOGY_MEMO[key] = _build_ontology(spark)
    return _ONTOLOGY_MEMO[key]


def _build_ontology(spark: SparkSession) -> DataFrame:
    """Per-entity ontology dim carrying the reference's FULL published
    properties/metadata taxonomy (properties_description.txt:7-306,
    meta_description.txt:8-346): GO annotations, InterPro sequence-
    annotation classes, SIDER drug associations, ClassyFire-style drug
    taxonomy, MeSH trees + supergroups, pathway hierarchy/category/GO,
    cell→tissue membership, MedGen MIM categories, ATC codes, and the
    per-type name/synonym/keyword metadata.

    Schema: (entity_id, entity_type, pred, value). TREE/ATC rows are raw
    hierarchy codes — the pipeline's routing expands them to
    TREE_PREFIX / DRUG_ATC_CODE level rows (pipeline/taxonomy.py).

    Plan shape: ONE branch per entity type — each row carries its whole
    (pred, value) fact list as an array<struct> built in a single
    projection, then explodes. The first cut unioned ~30 per-predicate
    projections over the (itself unioned) lexicon: ~400 plan branches,
    measured 7 s of driver-side plan construction + 20 s of evaluation
    for a 1,300-row dim. Same row set, two orders of magnitude cheaper.
    """

    def pick(options: list[str], *salt: str) -> Column:
        arr = F.array(*[F.lit(o) for o in options])
        return F.element_at(
            arr,
            (_h(len(options), "entity_id", *[F.lit(s) for s in salt]) + 1).cast("int"),
        )

    def pv(pred: Column | str, value: Column) -> Column:
        pred_col = F.lit(pred) if isinstance(pred, str) else pred
        return F.struct(pred_col.alias("pred"), value.alias("value"))

    def base_of(etype: str, id_fmt: str, stem: str, count: int) -> DataFrame:
        # one partition per branch: dim-sized, keeps every consumer job
        # at a handful of tasks instead of 32 per union branch
        return spark.range(count, numPartitions=1).select(
            F.format_string(id_fmt, F.col("id") + 1).alias("entity_id"),
            F.lit(etype).alias("entity_type"),
            F.format_string(stem, F.col("id") + 1).alias("surface"),
        )

    def explode_facts(base: DataFrame, facts: list[Column]) -> DataFrame:
        # null-valued entries model conditional rows (e.g. top-level
        # pathways have no parent) and are filtered out array-side
        arr = F.filter(F.array(*facts), lambda s: s["value"].isNotNull())
        return base.select(
            "entity_id",
            "entity_type",
            F.explode(arr).alias("f"),
        ).select("entity_id", "entity_type", F.col("f.pred"), F.col("f.value"))

    by_type = {t: (fmt, stem, cnt) for t, fmt, stem, cnt in _ENTITY_TYPES}
    parts: list[DataFrame] = []

    # ---- proteins: uniprot metadata + GO + InterPro ------------------
    prot = base_of("PROTEIN", *by_type["PROTEIN"])
    go = lambda salt: F.format_string(  # noqa: E731
        "GO:%07d", _h(10**7, "entity_id", F.lit(salt))
    )
    parts.append(explode_facts(prot, [
        pv("NAME", F.col("surface")),
        pv("FULL_NAME", F.concat(F.col("surface"), F.lit(" full protein"))),
        pv("SHORT_NAME", F.upper(F.substring("surface", 1, 4))),
        pv("ORGANISM_CLASS", F.lit("Eukaryota")),
        pv("ORGANISM_CLASS", pick(ORGANISM_CLASS_TAILS, "oc")),
        pv("SPECIES", pick(SPECIES_NAMES, "sp")),
        pv("OTHER_ID", F.concat(F.lit("UPI:"), F.col("entity_id"))),
        pv("RELATED_KEYWORD", pick(PROTEIN_KEYWORDS, "kw")),
        pv("RELATED_PUBMED_ID",
           F.format_string("pubmed:%d", 10000 + _h(90000, "entity_id", F.lit("pm")))),
        # GO annotations (protein_go_*.txt): 2×BP + 1×CC + 1×MF
        pv("GO_BP", go("g1")),
        pv("GO_BP", go("g2")),
        pv("GO_CC", go("g3")),
        pv("GO_MF", go("g4")),
        # InterPro: 2 per protein, class via the interpro_map analog
        # (reference parsers.py:329-334 routes IPR ids to class preds)
        pv(pick(INTERPRO_CLASSES, "ici1"),
           F.format_string("IPR%06d", _h(10**6, "entity_id", F.lit("ivi1")))),
        pv(pick(INTERPRO_CLASSES, "ici2"),
           F.format_string("IPR%06d", _h(10**6, "entity_id", F.lit("ivi2")))),
    ]))

    # ---- drugs: drugbank metadata + SIDER + ATC ----------------------
    drug = base_of("DRUG", *by_type["DRUG"])
    meddra = lambda salt: F.format_string(  # noqa: E731
        "C%07d", _h(10**7, "entity_id", F.lit(salt))
    )
    # WHO ATC classification codes (reference: parsers.py:1023-1049;
    # 7-char level-5 codes like B01AE02 whose prefixes encode the class
    # hierarchy)
    letters = F.array(*[F.lit(c) for c in "ABCDGHJLMNPRSV"])
    atc_code = F.concat(
        F.element_at(letters, (_h(14, "entity_id", F.lit("l1")) + 1).cast("int")),
        F.format_string("%02d", _h(17, "entity_id", F.lit("n1"))),
        F.element_at(letters, (_h(14, "entity_id", F.lit("l2")) + 1).cast("int")),
        F.element_at(letters, (_h(14, "entity_id", F.lit("l3")) + 1).cast("int")),
        F.format_string("%02d", _h(100, "entity_id", F.lit("n2"))),
    )
    parts.append(explode_facts(drug, [
        pv("NAME", F.col("surface")),
        pv("SYNONYM", F.concat(F.col("surface"), F.lit(" synonym"))),
        pv("TYPE", pick(DRUG_TYPES, "ty")),
        pv("PRODUCT", F.concat(F.col("surface"), F.lit(" 10 mg tablet"))),
        pv("PRODUCT_STAGE", pick(PRODUCT_STAGES, "st")),
        pv("CLASS", pick(CHEM_CLASSES, "cl")),
        pv("DIRECT_PARENT", pick(CHEM_CLASSES, "dp")),
        pv("ALTERNATIVE_PARENT", pick(CHEM_CLASSES, "ap")),
        pv("SUPERCLASS", F.lit("Organic compounds")),
        pv("SUBCLASS", pick(CHEM_CLASSES, "sc")),
        pv("SUBSTITUENT", pick(CHEM_SUBSTITUENTS, "su")),
        pv("KINGDOM", F.lit("Organic compounds")),
        pv("PUBMED_ARTICLE",
           F.format_string("pubmed:%d", 10000 + _h(90000, "entity_id", F.lit("dpm")))),
        # SIDER associations (drug_sideeffect / drug_indication, MedDRA)
        pv("DRUG_SIDEEFFECT_ASSOCIATION", meddra("se1")),
        pv("DRUG_SIDEEFFECT_ASSOCIATION", meddra("se2")),
        pv("DRUG_INDICATION_ASSOCIATION", meddra("in1")),
        pv("ATC", atc_code),
    ]))

    # ---- diseases: MeSH type/tree/supergroup -------------------------
    dis = base_of("DISEASE", *by_type["DISEASE"])
    parts.append(explode_facts(dis, [
        pv("NAME", F.col("surface")),
        pv("TYPE",
           F.when(_h(5, "entity_id", F.lit("mt")) == 0, "SCR_DISEASE")
           .otherwise("DISEASE")),
        pv("TREE",
           F.format_string(
               "C%02d.%03d.%03d",
               _h(20, "entity_id"),
               _h(999, "entity_id", F.lit("a")),
               _h(999, "entity_id", F.lit("b")),
           )),
        pv("DISEASE_SUPERGRP",
           F.format_string("D%06d", _h(10**6, "entity_id", F.lit("sg")))),
    ]))

    # ---- pathways: category, GO, Reactome parent hierarchy -----------
    pw = base_of("PATHWAY", *by_type["PATHWAY"])
    pw_idx = F.regexp_extract("entity_id", r"R-HSA-(\d+)", 1).cast("int")
    pgo = lambda salt: F.format_string(  # noqa: E731
        "GO:%07d", _h(10**7, "entity_id", F.lit(salt))
    )
    parts.append(explode_facts(pw, [
        pv("NAME", F.col("surface")),
        pv("PATHWAY_CATEGORY", pick(PATHWAY_CATEGORIES, "pc")),
        pv("PATHWAY_GO_BP", pgo("pg1")),
        pv("PATHWAY_GO_CC", pgo("pg2")),
        pv("PATHWAY_GO_MF", pgo("pg3")),
        # pathway i (i >= 3) has parent i // 2; pathways 1 and 2 stay
        # top-level — the set behind MEMBER_OF_TOP_LEVEL_PATHWAY
        pv("HAS_PARENT_PATHWAY",
           F.when(pw_idx >= 3,
                  F.format_string("R-HSA-%d", (pw_idx / 2).cast("int")))),
    ]))

    # ---- genetic disorders: MedGen MIM categories --------------------
    gd = base_of("GENETIC_DISORDER", *by_type["GENETIC_DISORDER"])
    parts.append(explode_facts(gd, [pv("CATEGORY", pick(MIM_CATEGORIES, "mc"))]))

    # ---- cells (Cellosaurus-ish): dim-only entities — cells come from
    # HPA/Cellosaurus tables, not transcript text, so they live here
    # without lexicon surfaces --------------------------------------
    cells = spark.range(10, numPartitions=1).select(
        F.format_string("CVCL_%04d", F.col("id") + 1).alias("entity_id"),
        F.lit("CELL").alias("entity_type"),
        F.format_string("celloid%d", F.col("id") + 1).alias("surface"),
    )
    tissue = F.concat(
        F.lit("TISSUE:"), pick(TISSUES, "tis")
    )
    parts.append(explode_facts(cells, [
        pv("NAME", F.col("surface")),
        pv("PART_OF_TISSUE", tissue),
    ]))

    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def transcripts(
    spark: SparkSession,
    n_conversations: int = 200,
    max_extra_turns: int = 10,
    words_per_turn: int = 12,
    mention_slots: int = 3,
    hot_entity_pct: int = 25,
    partitions: int | None = None,
) -> DataFrame:
    """Synthesize the primary transcript table, fully distributed.

    Mention density: ``mention_slots`` of the ``words_per_turn`` word slots
    draw from the lexicon surfaces instead of filler. Skew:
    ``hot_entity_pct`` percent of mention draws collapse onto entity #1 of
    each type — a deliberately hot key that exercises AQE skew handling and
    the salting helper (north rule).
    """
    surfaces = []
    for _etype, _fmt, stem, count in _ENTITY_TYPES:
        surfaces.extend(stem % i for i in range(1, count + 1))
        # synonym surfaces carry ALT-namespace ids → the link stage must
        # canonicalize them (every third entity has one, see entity_lexicon)
        surfaces.extend(stem % i + "x" for i in range(1, count + 1) if (i - 1) % 3 == 0)
    hot = [stem % 1 for _t, _f, stem, _c in _ENTITY_TYPES]
    filler_arr = F.array(*[F.lit(w) for w in _FILLER])
    surface_arr = F.array(*[F.lit(s) for s in surfaces])
    hot_arr = F.array(*[F.lit(s) for s in hot])

    convs = spark.range(n_conversations, numPartitions=partitions).select(
        F.format_string("conv%06d", F.col("id")).alias("conv_id"),
        (F.lit(3) + _h(max_extra_turns, F.format_string("conv%06d", F.col("id")))).alias(
            "n_turns"
        ),
    )
    turns = convs.select(
        "conv_id", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx")
    )

    def word(slot: int) -> Column:
        """Deterministic word for (conv, turn, slot)."""
        key = [F.col("conv_id"), F.col("turn_idx").cast("string"), F.lit(str(slot))]
        if slot < mention_slots:
            is_hot = _h(100, *key, F.lit("hot")) < F.lit(hot_entity_pct)
            hot_idx = _h(len(hot), *key, F.lit("hidx")) + 1
            sur_idx = _h(len(surfaces), *key, F.lit("sidx")) + 1
            return F.when(is_hot, F.element_at(hot_arr, hot_idx.cast("int"))).otherwise(
                F.element_at(surface_arr, sur_idx.cast("int"))
            )
        idx = _h(len(_FILLER), *key, F.lit("fill")) + 1
        return F.element_at(filler_arr, idx.cast("int"))

    # ---- fact-carrying turn kinds -------------------------------------
    # A deterministic share of turns IS a reference-shaped statement the
    # pipeline's extraction kernels must parse: DDI interaction
    # descriptions (the 15-pattern cascade), drug-protein action cues with
    # PubMed references, protein-expression levels, and organism-qualified
    # phosphorylation statements. The remainder are generic mention+filler
    # turns (with the deliberately hot entity #1 skew).
    k = [F.col("conv_id"), F.col("turn_idx").cast("string")]
    kind = _h(100, *k, F.lit("kind"))

    drug_surfaces = [s for t, _f, stem, c in _ENTITY_TYPES if t == "DRUG"
                     for s in ([stem % i for i in range(1, c + 1)]
                               + [stem % i + "x" for i in range(1, c + 1) if (i - 1) % 3 == 0])]
    prot_primary = [stem % i for t, _f, stem, c in _ENTITY_TYPES if t == "PROTEIN"
                    for i in range(1, c + 1)]
    drug_arr = F.array(*[F.lit(s) for s in drug_surfaces])
    prot_arr = F.array(*[F.lit(s) for s in prot_primary])

    def pick(arr: F.Column, n: int, *salt: str) -> Column:
        return F.element_at(arr, (_h(n, *k, *[F.lit(s) for s in salt]) + 1).cast("int"))

    # two DISTINCT drug surfaces; drugA collapses onto the hot drug for a
    # share of draws (skew pressure on the DDI pair aggregation)
    ia = _h(len(drug_surfaces), *k, F.lit("da"))
    ia = F.when(_h(100, *k, F.lit("dahot")) < F.lit(hot_entity_pct), F.lit(0)).otherwise(ia)
    ib = F.pmod(ia + 1 + _h(len(drug_surfaces) - 1, *k, F.lit("db")), F.lit(len(drug_surfaces)))
    drug_a = F.element_at(drug_arr, (ia + 1).cast("int"))
    drug_b = F.element_at(drug_arr, (ib + 1).cast("int"))

    tmpl = _h(len(DDI_SENTENCES), *k, F.lit("ddit"))
    ddi_text = F.lit(None).cast("string")
    for i, t in enumerate(DDI_SENTENCES):
        ddi_text = F.when(tmpl == i, F.format_string(t, drug_a, drug_b)).otherwise(ddi_text)

    prot_1 = pick(prot_arr, len(prot_primary), "p1")
    vidx = _h(len(ACTION_SENTENCES), *k, F.lit("verb"))
    action_text = F.lit(None).cast("string")
    for i, (t, _rel, _act) in enumerate(ACTION_SENTENCES):
        action_text = F.when(vidx == i, F.format_string(t, drug_a, prot_1)).otherwise(action_text)
    nrefs = _h(3, *k, F.lit("nrefs"))
    pm1 = (10000 + _h(90000, *k, F.lit("pm1"))).cast("string")
    pm2 = (10000 + _h(90000, *k, F.lit("pm2"))).cast("string")
    refs_suffix = (
        F.when(nrefs == 0, F.lit("."))
        .when(nrefs == 1, F.format_string(" (PubMed=%s).", pm1))
        .otherwise(F.format_string(" (PubMed=%s, PubMed=%s).", pm1, pm2))
    )
    action_text = F.concat(action_text, refs_suffix)

    expr_text = F.format_string(
        "%s expression in %s is %s.",
        prot_1,
        pick(F.array(*[F.lit(t) for t in TISSUES]), len(TISSUES), "tis"),
        pick(F.array(*[F.lit(t) for t in EXPRESSION_LEVELS]), len(EXPRESSION_LEVELS), "lvl"),
    )

    ja = _h(len(prot_primary), *k, F.lit("ka"))
    jb = F.pmod(ja + 1 + _h(len(prot_primary) - 1, *k, F.lit("kb")), F.lit(len(prot_primary)))
    phos_text = F.format_string(
        "%s (%s) phosphorylates %s (%s) at %s.",
        F.element_at(prot_arr, (ja + 1).cast("int")),
        pick(F.array(*[F.lit(o) for o in ORGANISMS]), len(ORGANISMS), "oa"),
        F.element_at(prot_arr, (jb + 1).cast("int")),
        pick(F.array(*[F.lit(o) for o in ORGANISMS]), len(ORGANISMS), "ob"),
        pick(F.array(*[F.lit(s) for s in PHOS_SITES]), len(PHOS_SITES), "site"),
    )

    generic_text = F.concat_ws(" ", *[word(s) for s in range(words_per_turn)])

    # One projection per turn kind, unioned — a single when-chain over all
    # templates exceeds Janino's 64 KB method limit and silently falls back
    # to interpreted row eval; per-kind projections keep every stage inside
    # whole-stage codegen. Row set identical either way (kind partitions
    # the key space deterministically).
    base = turns.select("conv_id", F.col("turn_idx").cast("int").alias("turn_idx"))
    parts_df = [
        base.where(kind < 18).select("conv_id", "turn_idx", ddi_text.alias("text")),
        base.where((kind >= 18) & (kind < 28)).select(
            "conv_id", "turn_idx", action_text.alias("text")
        ),
        base.where((kind >= 28) & (kind < 36)).select(
            "conv_id", "turn_idx", expr_text.alias("text")
        ),
        base.where((kind >= 36) & (kind < 44)).select(
            "conv_id", "turn_idx", phos_text.alias("text")
        ),
        base.where(kind >= 44).select(
            "conv_id", "turn_idx", generic_text.alias("text")
        ),
    ]
    body = parts_df[0]
    for p in parts_df[1:]:
        body = body.unionByName(p)

    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"))
    role = F.element_at(roles, (F.pmod(F.col("turn_idx"), 3) + 1).cast("int"))
    return body.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        "text",
        F.when(role == "tool", F.lit("search")).otherwise(F.lit(None).cast("string")).alias(
            "tool"
        ),
        (
            F.timestamp_seconds(
                F.lit(1700000000)
                + _h(10**6, "conv_id") * 3600
                + F.col("turn_idx") * 30
            )
        ).alias("ts"),
    )
