"""The flagship parse→map/link→aggregate→emit KG-construction pipeline.

Reference lifecycle being re-expressed (SURVEY.md §3):
``preprocess_graph`` (parse, main.py:13) → ``compile_graph`` (link/emit,
compile_biokg.py:1175) → ``build_benchmarks`` (derive,
build_benchmarks.py:23) — re-architected as checkpointed DataFrame stages
over a transcript table instead of a single-threaded file walk.

Stages (each a checkpointed parquet table, resumable):

1. **ingest** — order/validate transcripts: duplicate (conv_id, turn_idx)
   keys are a hard error; per-turn text equality is checked by key-join
   (never positional zip). Repartitioned on hash(conv_id) so every
   downstream per-conversation op is co-located.
2. **mentions** — Arrow-batched dictionary scan (operators/mentions.py)
   against the broadcast lexicon → (conv_id, turn_idx, entity, type).
3. **linked** — canonicalization: broadcast join against id_mapping maps
   raw ``ALT:`` ids to canonical ids (1:N fan-out preserved, reference:
   parsers.py:1970-1988); unmapped ids pass through (already canonical).
4. **triples** — emit the graph:
   - MENTIONS (turn → entity) with provenance refs;
   - typed co-occurrence links per entity-type pair (PPI, DPI, DDI, …)
     with the reference's undirected canonical form (least, greatest)
     for symmetric predicates (compile_biokg.py:192-195);
   - DPI effect quads via the ordered cue cascade (first-match-wins,
     reference: parsers.py:927-977) with conflict exclusion: a (drug,
     protein) pair seen with both INCREASES and DECREASES is dropped
     (reference: build_benchmarks.py:101-105);
   - ontology passthrough (NAME/TYPE) + TREE prefix expansion
     (reference: parsers.py:3073-3083).
   Closed predicate vocabulary enforced exactly like the reference's
   fan-out writers raise on unknown predicates (compile_biokg.py:969).
5. **emit** — partitioned-by-predicate parquet table families
   (links / properties / metadata), the Spark analog of the reference's
   per-predicate file tree (compile_biokg.py:292-305).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biokg_spark.operators.hierarchy import expand_prefixes
from biokg_spark.operators.mentions import scan_mentions
from biokg_spark.operators.skew import salted_collect_set
from biokg_spark.plans.checkpoint import CheckpointManager, fingerprint

# Typed predicate per unordered entity-type pair; bool = undirected
# (canonical least/greatest form). Vocabulary mirrors the reference's
# links_description.txt naming.
LINK_PREDICATES: dict[tuple[str, str], tuple[str, bool]] = {
    ("PROTEIN", "PROTEIN"): ("PPI", True),
    ("DRUG", "DRUG"): ("DDI", True),
    ("DRUG", "PROTEIN"): ("DPI", False),
    ("DRUG", "DISEASE"): ("DRUG_DISEASE_ASSOCIATION", False),
    ("PROTEIN", "DISEASE"): ("PROTEIN_DISEASE_ASSOCIATION", False),
    ("PROTEIN", "PATHWAY"): ("MEMBER_OF_PATHWAY", False),
    ("DRUG", "PATHWAY"): ("DRUG_PATHWAY_ASSOCIATION", False),
    ("DISEASE", "PATHWAY"): ("DISEASE_PATHWAY_ASSOCIATION", False),
}

PREDICATE_VOCABULARY = frozenset(
    [p for p, _ in LINK_PREDICATES.values()]
    + ["MENTIONS", "NAME", "TYPE", "TREE", "TREE_PREFIX", "DPI_EFFECT"]
)

# Ordered effect cascade — earlier pattern wins (reference: parsers.py:976).
EFFECT_CASCADE: list[tuple[str, str]] = [
    (r"\bincreases\b", "INCREASES"),
    (r"\bdecreases\b", "DECREASES"),
    (r"\baffects\b", "AFFECTS"),
]


def extract_effect(text_col: str = "text") -> F.Column:
    """First-match-wins ordered cascade as a single coalesce chain."""
    branches = [
        F.when(F.col(text_col).rlike(pat), F.lit(label))
        for pat, label in EFFECT_CASCADE
    ]
    return F.coalesce(*branches, F.lit(None).cast("string"))


def cooccurrence_links(
    ents: DataFrame,
    keys: list[str],
    id_col: str = "eid",
    type_col: str = "entity_type",
) -> DataFrame:
    """Typed co-occurrence edges from per-group entity sets.

    ``ents``: one row per (group keys, entity id, entity type); entities
    sharing a group become edges typed by LINK_PREDICATES, with undirected
    predicates stored in canonical (least, greatest) form (reference:
    compile_biokg.py:192-195) and directed predicates oriented by the
    vocabulary's subject type. Output: distinct (subj, pred, obj).

    Physical plan: ONE linear shuffle. The naive fact-fact self-join on the
    group keys shuffles the mention table twice, joins, then shuffles again
    to dedup — three wide stages whose cost at 10^12 turns is dominated by
    re-shuffling the same rows. Instead each group's (small, bounded)
    entity set is collected once and pairs are expanded array-side inside
    the same stage; the final distinct collapses map-side because the
    output key space (entity × entity) is tiny relative to the input.
    """
    per_group = entity_sets(ents, keys, id_col, type_col)
    return links_from_entity_sets(per_group)


def entity_sets(
    ents: DataFrame,
    keys: list[str],
    id_col: str = "eid",
    type_col: str = "entity_type",
) -> DataFrame:
    """Per-group sorted entity set: keys + ``ms`` array<struct<eid,type>>.

    The ONE aggregation both co-occurrence links and effect quads consume
    — sharing it (as a checkpointed stage) removes a duplicate full
    shuffle of the linked-mention table, a reuse no optimizer does across
    jobs."""
    ents = ents.select(
        *keys, F.col(id_col).alias("eid"), F.col(type_col).alias("entity_type")
    )
    return ents.groupBy(*keys).agg(
        F.array_sort(
            F.collect_set(F.struct(F.col("eid"), F.col("entity_type")))
        ).alias("ms")
    )


def links_from_entity_sets(per_group: DataFrame) -> DataFrame:
    """Typed distinct (subj, pred, obj) from per-group entity sets."""
    per_group = per_group.where(F.size("ms") >= 2)
    ms = F.col("ms")
    # ordered pairs (i < j) from the sorted set: a.eid <= b.eid by sort order
    pair_arr = F.flatten(
        F.transform(
            ms,
            lambda a, i: F.transform(
                F.slice(ms, i + F.lit(2), F.size(ms)),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )
    pairs = (
        per_group.select(F.explode(pair_arr).alias("p"))
        .select(
            F.col("p.a.eid").alias("e1"),
            F.col("p.a.entity_type").alias("t1"),
            F.col("p.b.eid").alias("e2"),
            F.col("p.b.entity_type").alias("t2"),
        )
        .where(F.col("e1") != F.col("e2"))
    )
    pred = F.lit(None).cast("string")
    directed_first = F.lit(None).cast("string")
    for (ta, tb), (pname, _und) in LINK_PREDICATES.items():
        hit_ab = (F.col("t1") == ta) & (F.col("t2") == tb)
        hit_ba = (F.col("t1") == tb) & (F.col("t2") == ta)
        pred = F.when(hit_ab | hit_ba, F.lit(pname)).otherwise(pred)
        directed_first = (
            F.when(hit_ab, F.col("e1")).when(hit_ba, F.col("e2")).otherwise(directed_first)
        )
    typed = pairs.select(
        "e1", "e2", pred.alias("pred"), directed_first.alias("dfirst")
    ).where(F.col("pred").isNotNull())
    undirected_names = [p for p, und in LINK_PREDICATES.values() if und]
    subj = F.when(
        F.col("pred").isin(undirected_names), F.least("e1", "e2")
    ).otherwise(F.col("dfirst"))
    obj = F.when(
        F.col("pred").isin(undirected_names), F.greatest("e1", "e2")
    ).otherwise(
        F.when(F.col("dfirst") == F.col("e1"), F.col("e2")).otherwise(F.col("e1"))
    )
    return typed.select(subj.alias("subj"), F.col("pred"), obj.alias("obj")).dropDuplicates()


class KGPipeline:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        lexicon: DataFrame,
        id_mapping: DataFrame | None = None,
        ontology: DataFrame | None = None,
        scanner_backend: str = "auto",
        buckets: int = 32,
        canonicalizer: str = "mapping",
        disambiguation: str = "priority",
    ):
        """``canonicalizer``: 'mapping' uses the curated ``id_mapping`` dim
        (the reference's biodblinker analog, J3); 'lsh' DERIVES the mapping
        from the lexicon's surface forms via MinHash/LSH (north-star
        replacement for the hand-curated tables — no ``id_mapping``
        needed).

        ``disambiguation``: 'priority' resolves ambiguous surfaces at scan
        time by static lexicon priority (the reference's first-match-wins,
        parsers.py:976); 'context' emits surface occurrences and scores
        every candidate entity by per-turn type context
        (operators/linking.py — the north star's candidate entity-link
        scoring stage)."""
        if canonicalizer not in ("mapping", "lsh"):
            raise ValueError(f"unknown canonicalizer {canonicalizer!r}")
        if disambiguation not in ("priority", "context"):
            raise ValueError(f"unknown disambiguation {disambiguation!r}")
        if canonicalizer == "mapping" and id_mapping is None:
            raise ValueError("canonicalizer='mapping' requires id_mapping")
        self.spark = spark
        self.ckpt = CheckpointManager(spark, workdir)
        self.lexicon = lexicon
        self.id_mapping = id_mapping
        self.ontology = ontology
        self.scanner_backend = scanner_backend
        self.buckets = buckets
        self.canonicalizer = canonicalizer
        self.disambiguation = disambiguation

    # ------------------------------------------------------------------
    def run(self, transcripts: DataFrame, run_key: str = "default") -> dict[str, DataFrame]:
        fp0 = fingerprint("ingest", run_key, str(self.buckets))
        ingested = self.ckpt.run("ingest", fp0, lambda: self._ingest(transcripts))

        fp1 = fingerprint("mentions", fp0, self.scanner_backend, self.disambiguation)
        mentions = self.ckpt.run("mentions", fp1, lambda: self._mentions(ingested))

        fp2 = fingerprint("linked", fp1, self.canonicalizer)
        linked = self.ckpt.run("linked", fp2, lambda: self._link(mentions))

        # shared per-turn entity sets: the single aggregation both the
        # links and quads stages consume (one shuffle instead of two)
        fp2b = fingerprint("turn_sets", fp2)
        turn_sets = self.ckpt.run(
            "turn_sets", fp2b, lambda: self._turn_sets(linked)
        )

        # The four output families are independent given (linked, ingested)
        # — submit them as CONCURRENT Spark jobs (SparkSession is
        # thread-safe for job submission). Sequential execution would
        # serialize four driver-side latency floors and leave executor
        # slots idle between stages; on a real cluster these are exactly
        # the jobs you overlap.
        from concurrent.futures import ThreadPoolExecutor

        tasks: dict[str, tuple] = {
            "links": (
                fingerprint("links", fp2b),
                lambda: self._links(turn_sets),
                ["pred"],
            ),
            "quads": (
                fingerprint("quads", fp2b),
                lambda: self._effect_quads(turn_sets, ingested),
                None,
            ),
            "metadata": (
                fingerprint("metadata", fp2),
                lambda: self._metadata(linked),
                ["pred"],
            ),
        }
        if self.ontology is not None:
            tasks["properties"] = (
                fingerprint("properties", run_key),
                lambda: self._properties(),
                ["pred"],
            )
        out = {
            "ingest": ingested,
            "mentions": mentions,
            "linked": linked,
            "turn_sets": turn_sets,
        }
        with ThreadPoolExecutor(max_workers=len(tasks)) as pool:
            futures = {
                name: pool.submit(self.ckpt.run, name, fp, build, partition_by=pb)
                for name, (fp, build, pb) in tasks.items()
            }
            for name, fut in futures.items():
                out[name] = fut.result()
        self._assert_vocabulary(out)
        return out

    # -- stage 1: ingest/order ------------------------------------------
    def _ingest(self, transcripts: DataFrame) -> DataFrame:
        # key-uniqueness gate as ONE aggregation job over just the key
        # columns (column-pruned scan; the groupBy+filter+limit variant
        # costs an extra shuffle stage and a second job)
        stats = transcripts.select(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.struct("conv_id", "turn_idx")).alias("nd"),
        ).first()
        if stats["n"] != stats["nd"]:
            raise ValueError("duplicate (conv_id, turn_idx) keys in transcripts")
        # hash(conv_id) bucketing: all per-conversation work co-located;
        # at cluster scale this is the table's bucket spec, not a shuffle
        # per run.
        return transcripts.repartition(self.buckets, "conv_id")

    # -- stage 2: parse/mention-detect ------------------------------------
    def _mentions(self, ingested: DataFrame) -> DataFrame:
        raw = scan_mentions(
            ingested,
            self.lexicon,
            text_col="text",
            keys=("conv_id", "turn_idx"),
            backend=self.scanner_backend,
        )
        if self.disambiguation == "priority":
            return raw
        # context mode: the scanner found WHERE surfaces occur; WHICH
        # candidate entity each ambiguous surface denotes is re-decided by
        # per-turn type context (north star: candidate entity-link scoring)
        from biokg_spark.operators.linking import candidate_links

        resolved = candidate_links(
            raw.select("conv_id", "turn_idx", "surface"), self.lexicon
        )
        occurrences = raw.select("conv_id", "turn_idx", "surface", "span_start")
        return occurrences.join(
            resolved.select("conv_id", "turn_idx", "surface", "entity_id", "entity_type"),
            ["conv_id", "turn_idx", "surface"],
        ).select(
            "conv_id", "turn_idx", "surface", "entity_id", "entity_type", "span_start"
        )

    # -- stage 3: map/link (canonicalization) -----------------------------
    def _link(self, mentions: DataFrame) -> DataFrame:
        if self.canonicalizer == "lsh":
            from biokg_spark.operators.canonicalize import derive_id_mapping_lsh

            raw_mapping = derive_id_mapping_lsh(self.lexicon)
        else:
            raw_mapping = self.id_mapping
        mapping = F.broadcast(
            raw_mapping.select(
                F.col("src_id"), F.col("dst_id").alias("canonical_id")
            )
        )
        return (
            mentions.join(mapping, mentions.entity_id == mapping.src_id, "left")
            .withColumn("canonical_id", F.coalesce("canonical_id", "entity_id"))
            .drop("src_id")
        )

    # -- stage 3b: shared per-turn entity sets -----------------------------
    def _turn_sets(self, linked: DataFrame) -> DataFrame:
        return entity_sets(
            linked.select(
                "conv_id", "turn_idx", F.col("canonical_id").alias("eid"), "entity_type"
            ),
            keys=["conv_id", "turn_idx"],
        )

    # -- stage 4a: typed co-occurrence links ------------------------------
    def _links(self, turn_sets: DataFrame) -> DataFrame:
        return links_from_entity_sets(turn_sets)

    # -- stage 4b: DPI effect quads with conflict exclusion ---------------
    def _effect_quads(self, turn_sets: DataFrame, ingested: DataFrame) -> DataFrame:
        """Plan notes (10^12-turn discipline): the per-turn drug and protein
        sets derive from the SHARED turn_sets aggregation (zero additional
        shuffles of the mention table; the two-filtered-copies-then-join
        alternative shuffles it twice and materializes the drug×prot
        blow-up before any reduction). The drug×prot expansion happens
        array-side after the turns are already reduced to (drugs, prots,
        effect) triples, refs are merged with a salted two-phase set agg
        (hot pairs), and the INCREASES/DECREASES conflict rule (reference:
        parsers.py:1989-1990) is an array filter over the ≤3 effect rows
        per pair — no extra join."""
        effects = ingested.select(
            "conv_id", "turn_idx", extract_effect("text").alias("effect")
        ).where(F.col("effect").isNotNull())
        of_type = lambda t: F.transform(  # noqa: E731
            F.filter(F.col("ms"), lambda m: m["entity_type"] == t),
            lambda m: m["eid"],
        )
        per_turn = turn_sets.select(
            "conv_id",
            "turn_idx",
            of_type("DRUG").alias("drugs"),
            of_type("PROTEIN").alias("prots"),
        ).where((F.size("drugs") > 0) & (F.size("prots") > 0))
        dpi = (
            per_turn.join(effects, ["conv_id", "turn_idx"])
            .select(
                F.explode("drugs").alias("drug"),
                "prots",
                "effect",
                F.concat_ws("#", "conv_id", "turn_idx").alias("ref"),
            )
            .select("drug", F.explode("prots").alias("prot"), "effect", "ref")
        )
        # hot (drug, prot) pairs carry a huge share of refs — salted
        # two-phase set aggregation keeps the merge off a single reducer
        refs = salted_collect_set(
            dpi, ["drug", "prot", "effect"], "ref", out_col="refs"
        )
        # AFFECTS rows always survive; INCREASES/DECREASES only when the
        # pair is direction-consistent across the whole table
        per_pair = refs.groupBy("drug", "prot").agg(
            F.collect_list(F.struct("effect", "refs")).alias("fx")
        )
        has_inc = F.exists("fx", lambda x: x["effect"] == F.lit("INCREASES"))
        has_dec = F.exists("fx", lambda x: x["effect"] == F.lit("DECREASES"))
        keep = F.filter(
            F.col("fx"),
            lambda x: (x["effect"] == F.lit("AFFECTS")) | ~(has_inc & has_dec),
        )
        return (
            per_pair.select("drug", "prot", F.explode(keep).alias("x"))
            .select(
                F.col("drug").alias("subj"),
                F.lit("DPI_EFFECT").alias("pred"),
                F.col("prot").alias("obj"),
                F.col("x.effect").alias("qual"),
                F.lit("CURATED").alias("status"),
                F.col("x.refs").alias("refs"),
            )
        )

    # -- stage 4c: MENTIONS metadata --------------------------------------
    def _metadata(self, linked: DataFrame) -> DataFrame:
        return (
            linked.select(
                F.concat_ws("#", "conv_id", "turn_idx").alias("subj"),
                F.lit("MENTIONS").alias("pred"),
                F.col("canonical_id").alias("obj"),
            )
            .dropDuplicates()
        )

    # -- stage 4d: ontology properties (tree expansion) -------------------
    def _properties(self) -> DataFrame:
        assert self.ontology is not None
        # non-TREE rows pass through untouched (the reference's "other"
        # copy-through, compile_biokg.py:1276-1384); unknown predicates
        # surface at the vocabulary assert, like the fan-out raise
        base = self.ontology.select(
            F.col("entity_id").alias("subj"), "pred", F.col("value").alias("obj")
        ).where(F.col("pred") != "TREE")
        trees = self.ontology.where(F.col("pred") == "TREE")
        expanded = expand_prefixes(trees, "value", out_col="prefix").select(
            F.col("entity_id").alias("subj"),
            F.lit("TREE_PREFIX").alias("pred"),
            F.col("prefix").alias("obj"),
        )
        return base.unionByName(expanded).dropDuplicates()

    # -- vocabulary closure (reference: compile_biokg.py:969) -------------
    def _assert_vocabulary(self, outputs: dict[str, DataFrame]) -> None:
        # ONE job for all families instead of one collect per table. For
        # the pred-partitioned tables (links/metadata/properties) the scan
        # is partition-pruned: distinct pred values come from directory
        # names, no data pages are read.
        preds = None
        tagged = []
        for name in ("links", "quads", "metadata", "properties"):
            df = outputs.get(name)
            if df is None:
                continue
            p = df.select(F.col("pred"), F.lit(name).alias("family"))
            preds = p if preds is None else preds.unionByName(p)
            tagged.append(name)
        if preds is None:
            return
        bad = (
            preds.where(~F.col("pred").isin(*PREDICATE_VOCABULARY))
            .select("pred", "family")
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                f"Predicate not recognized {bad[0]['pred']!r} in {bad[0]['family']}"
            )

    # -- stage 5: derived benchmarks (reference: build_benchmarks.py) ------
    def derive_benchmarks_stage(
        self, outputs: dict[str, DataFrame], approved_drugs: DataFrame,
        run_key: str = "default",
    ) -> dict[str, DataFrame]:
        """Checkpoint the five benchmark extractions over the emitted graph
        (reference lifecycle stage 3, SURVEY.md §3.4)."""
        from biokg_spark.pipeline.benchmarks import derive_benchmarks

        derived = derive_benchmarks(
            outputs["links"], outputs["quads"], approved_drugs
        )
        out = {}
        for name, df in derived.items():
            fp = fingerprint("bench_" + name, run_key)
            out[name] = self.ckpt.run("bench_" + name, fp, lambda df=df: df)
        return out

    # -- stage 6: core export (reference: compile_biokg.py:1083-1127 + K5) -
    def export_core(self, outputs: dict[str, DataFrame], path: str) -> None:
        """Reference-compatible core dumps: one TSV directory per family,
        quad refs comma-joined exactly like the reference's on-disk form
        (parsers.py:901); links+metadata concatenated into the core edge
        table the way generate_core_links cats per-predicate files."""
        from biokg_spark.sources.tables import write_tsv

        core_links = outputs["links"].unionByName(
            outputs["metadata"].select("subj", "pred", "obj")
        )
        write_tsv(core_links.select("subj", "pred", "obj"), f"{path}/links")
        quads = outputs["quads"].select(
            "subj", "pred", "obj", "qual", "status",
            F.concat_ws(",", "refs").alias("refs"),
        )
        write_tsv(quads, f"{path}/quads")
        if "properties" in outputs:
            write_tsv(
                outputs["properties"].select("subj", "pred", "obj"),
                f"{path}/properties",
            )

    # ------------------------------------------------------------------
    def metrics(self) -> dict[str, dict]:
        return self.ckpt.metrics()
