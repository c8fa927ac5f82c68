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
]

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
    for etype, id_fmt, stem, count in _ENTITY_TYPES:
        base = spark.range(count).select(
            F.format_string(id_fmt, F.col("id") + 1).alias("entity_id"),
            F.format_string(stem, F.col("id") + 1).alias("surface"),
            F.lit(etype).alias("entity_type"),
            F.lit(0).alias("priority"),
        )
        syn = (
            spark.range(count)
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


def ontology(spark: SparkSession) -> DataFrame:
    """Entity metadata dim: NAME/TYPE rows plus MeSH-style tree paths."""
    lex = entity_lexicon(spark).where(F.col("priority") == 0)
    names = lex.select(
        "entity_id", F.lit("NAME").alias("pred"), F.col("surface").alias("value")
    )
    types = lex.select(
        "entity_id", F.lit("TYPE").alias("pred"), F.col("entity_type").alias("value")
    )
    trees = lex.where(F.col("entity_type") == "DISEASE").select(
        "entity_id",
        F.lit("TREE").alias("pred"),
        F.format_string(
            "C%02d.%03d.%03d",
            _h(20, "entity_id"),
            _h(999, "entity_id", F.lit("a")),
            _h(999, "entity_id", F.lit("b")),
        ).alias("value"),
    )
    return names.unionByName(types).unionByName(trees)


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

    cue_arr = F.array(F.lit("increases"), F.lit("decreases"), F.lit("affects"))

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
        if slot == mention_slots:
            # relation-cue slot: ~40% of turns carry an effect verb that
            # the extraction cascade (pipeline/kg.py) picks up
            has_cue = _h(100, *key, F.lit("cue?")) < 40
            cue_idx = _h(3, *key, F.lit("cue")) + 1
            return F.when(has_cue, F.element_at(cue_arr, cue_idx.cast("int"))).otherwise(
                F.element_at(
                    filler_arr, (_h(len(_FILLER), *key, F.lit("fill")) + 1).cast("int")
                )
            )
        idx = _h(len(_FILLER), *key, F.lit("fill")) + 1
        return F.element_at(filler_arr, idx.cast("int"))

    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"))
    role = F.element_at(roles, (F.pmod(F.col("turn_idx"), 3) + 1).cast("int"))
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat_ws(" ", *[word(s) for s in range(words_per_turn)]).alias("text"),
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
