"""Reference-faithful pure-Python oracle for the KG pipeline.

Deliberately written in the reference's idiom — row-at-a-time loops,
dict/set accumulation (reference: compile_biokg.py:186-195,
parsers.py:1952-2014) — so the golden test compares a genuinely
independent implementation against the Spark pipeline. Comparison is
order-insensitive set P/R (reference output order is nondeterministic,
compile_biokg.py:196-201).
"""

from __future__ import annotations

import re

UNDIRECTED = {"PPI", "DDI"}
TYPE_PAIR_PRED = {
    frozenset(["PROTEIN"]): "PPI",
    frozenset(["DRUG"]): "DDI",
    frozenset(["DRUG", "PROTEIN"]): "DPI",
    frozenset(["DRUG", "DISEASE"]): "DRUG_DISEASE_ASSOCIATION",
    frozenset(["PROTEIN", "DISEASE"]): "PROTEIN_DISEASE_ASSOCIATION",
    frozenset(["PROTEIN", "PATHWAY"]): "PROTEIN_PATHWAY_ASSOCIATION",
    frozenset(["DRUG", "PATHWAY"]): "DRUG_PATHWAY_ASSOCIATION",
    frozenset(["DISEASE", "PATHWAY"]): "DISEASE_PATHWAY_ASSOCIATION",
    frozenset(["PROTEIN", "COMPLEX"]): "MEMBER_OF_COMPLEX",
    # refined to MEMBER_OF_TOP_LEVEL_PATHWAY when the pathway has no
    # parent in the hierarchy (links_description.txt:163 vs :176)
    frozenset(["COMPLEX", "PATHWAY"]): "MEMBER_OF_PATHWAY",
    frozenset(["DISEASE", "GENETIC_DISORDER"]): "DISEASE_GENETIC_DISORDER",
    frozenset(["PROTEIN", "GENETIC_DISORDER"]): "RELATED_GENETIC_DISORDER",
}
# subject type per DIRECTED type pair
DIRECTED_FIRST = {
    frozenset(["DRUG", "PROTEIN"]): "DRUG",
    frozenset(["DRUG", "DISEASE"]): "DRUG",
    frozenset(["PROTEIN", "DISEASE"]): "PROTEIN",
    frozenset(["PROTEIN", "PATHWAY"]): "PROTEIN",
    frozenset(["DRUG", "PATHWAY"]): "DRUG",
    frozenset(["DISEASE", "PATHWAY"]): "DISEASE",
    frozenset(["PROTEIN", "COMPLEX"]): "PROTEIN",
    frozenset(["COMPLEX", "PATHWAY"]): "COMPLEX",
    frozenset(["DISEASE", "GENETIC_DISORDER"]): "DISEASE",
    frozenset(["PROTEIN", "GENETIC_DISORDER"]): "PROTEIN",
}
# The reference's 15 ordered DDI side-effect patterns + maps
# (parsers.py:24-82), carried here INDEPENDENTLY of the engine package so
# the golden comparison is two implementations of the same contract.
DDI_PATTERNS = [re.compile(p) for p in [
    r"The risk or severity of (?P<se>.*) can be (?P<mode>\S+)d when .* is combined with .*",
    r".* may (?P<mode>\S+) (?P<se>\S+\s?\w*\s?\w*) of .* as a diagnostic agent.",
    r"The (?P<se>\S+\s?\w*\s?\w*) of .* can be (?P<mode>\S+)d when used in combination with .*",
    r"The (?P<se>\S+\s?\w*\s?\w*) of .* can be (?P<mode>\S+)d when it is combined with .*",
    r".* can cause a decrease in the absorption of .* resulting in a (?P<mode>\S+) (?P<se>\S+\s?\w*\s?\w*) and potentially a decrease in efficacy.",
    r".* may decrease the excretion rate of .* which could result in a (?P<mode>\S+) (?P<se>\S+\s?\w*\s?\w*).",
    r".* may increase the excretion rate of .* which could result in a (?P<mode>\S+) (?P<se>\S+\s?\w*\s?\w*) and potentially a reduction in efficacy.",
    r"The (?P<se>\S+\s?\w*\s?\w*) of .* can be (?P<mode>\S+)d when combined with .*",
    r".* can cause an increase in the absorption of .* resulting in an (?P<mode>\S+)d (?P<se>\S+\s?\w*\s?\w*) and potentially a worsening of adverse effects.",
    r"The risk of a (?P<se>\S+\s?\w*\s?\w*) to .* is (?P<mode>\S+)d when it is combined with .*",
    r"The (?P<se>\S+\s?\w*\s?\w*) of .* can be (?P<mode>\S+)d when combined with .*",
    r"The (?P<se>\S+\s?\w*\s?\w*) of the active metabolites of .* can be (?P<mode>\S+)d when .* is used in combination with .*",
    r"The (?P<se>\S+\s?\w*\s?\w*) of .*, an active metabolite of .* can be (?P<mode>\S+)d when used in combination with .*",
    r".* may (?P<mode>\S+) the (?P<se>.*) of .*",
    r".* may (?P<mode>\S+) the central nervous system depressant (?P<se>\S+\s?\S*\s?\S*) of .*",
]]
MODE_MAP = {
    "reduced": "decrease", "increase": "increase", "higher": "increase",
    "decrease": "decrease", "reduce": "decrease", "lower": "decrease",
}
SE_NAME_MAP = {
    "central_nervous_system_depressant_(cns_depressant)_activities": "cns_depression_activities",
    "(cns_depressant)_activities": "cns_depression_activities",
    "cns_depression": "cns_depression_activities",
    "cardiotoxic_activities": "cardiotoxicity",
    "constipating_activities": "constipation",
    "excretion": "excretion_rate",
    "hyperkalemic_activities": "hyperkalemia",
    "hypertensive_activities": "hypertension",
    "qtc-prolonging_activities": "qtc_prolongation",
    "tachycardic_activities": "tachycardia",
    "hypokalemic_activities": "hypokalemia",
    "hypoglycemic_activities": "hypoglycemia",
    "hypercalcemic_activities": "hypercalcemia",
    "bradycardic_activities": "bradycardia",
    "neutropenic_activities": "neutropenia",
    "orthostatic_hypotensive_activities": "orthostatic_hypotension",
    "pseudotumor_cerebri_activities": "pseudotumor_cerebri",
    "sedative_activities": "sedation",
    "ototoxic_activities": "ototoxicity",
    "neuromuscular_blocking_activities": "neuromuscular_blockade",
    "nephrotoxic_activities": "nephrotoxicity",
    "myelosuppressive_activities": "myelosuppression",
    "hypotensive_activities": "hypotension",
    "serum_level": "serum_concentration",
}

ACTION_CUES = [
    (re.compile(r"\binhibits\b"), "DRUG_TARGET", "inhibitor"),
    (re.compile(r"\bactivates\b"), "DRUG_TARGET", "activator"),
    (re.compile(r"\bbinds\b"), "DRUG_TARGET", "unknown"),
    (re.compile(r"\bis metabolized by\b"), "DRUG_ENZYME", "substrate"),
    (re.compile(r"\bis transported by\b"), "DRUG_TRANSPORTER", "substrate"),
    (re.compile(r"\bis carried by\b"), "DRUG_CARRIER", "substrate"),
    (re.compile(r"\bincreases expression of\b"), "DPI", "increases_expression"),
    (re.compile(r"\bdecreases expression of\b"), "DPI", "decreases_expression"),
]
PUBMED_RX = re.compile(r"PubMed=(\d+)")
EXPRESSION_RX = re.compile(r"\bexpression in (\w+) is (\w+)\b")
PHOS_RX = re.compile(r"^(\S+) \((\w+)\) phosphorylates (\S+) \((\w+)\) at (\w+)\.")
_BOUND = r"(?<![A-Za-z0-9_]){}(?![A-Za-z0-9_])"

# Independent copy of the per-type properties/metadata taxonomy
# (properties_description.txt:7-306, meta_description.txt:8-346) — the
# golden comparison runs two implementations of the same published
# contract; the contract itself is pinned in tests/test_taxonomy_contract.
ORACLE_PROPERTY_VOCAB = {
    "PROTEIN": {"GO_BP", "GO_CC", "GO_MF", "ACTIVE_SITE", "BINDING_SITE",
                "CONSERVED_SITE", "DOMAIN", "FAMILY", "HOMOLOGOUS_SUPERFAMILY",
                "PTM", "REPEAT", "PROTEIN_EXPRESSED_IN"},
    "DRUG": {"DRUG_ATC_CODE", "DRUG_SIDEEFFECT_ASSOCIATION",
             "DRUG_INDICATION_ASSOCIATION"},
    "CELL": {"PART_OF_TISSUE"},
    "DISEASE": {"DISEASE_SUPERGRP", "TREE_PREFIX"},
    "PATHWAY": {"PATHWAY_CATEGORY", "HAS_PARENT_PATHWAY",
                "PATHWAY_GO_BP", "PATHWAY_GO_CC", "PATHWAY_GO_MF"},
    "GENETIC_DISORDER": {"CATEGORY"},
}
ORACLE_METADATA_VOCAB = {
    "PROTEIN": {"NAME", "FULL_NAME", "SHORT_NAME", "ORGANISM_CLASS", "SPECIES",
                "OTHER_ID", "RELATED_KEYWORD", "RELATED_PUBMED_ID"},
    "DRUG": {"NAME", "SYNONYM", "TYPE", "PRODUCT", "PRODUCT_STAGE", "CLASS",
             "DIRECT_PARENT", "ALTERNATIVE_PARENT", "SUPERCLASS", "SUBCLASS",
             "SUBSTITUENT", "KINGDOM", "PUBMED_ARTICLE"},
    "DISEASE": {"NAME", "TYPE"},
    "PATHWAY": {"NAME"},
    "CELL": {"NAME"},
}


def _sanitize_se(txt):
    return txt.strip().replace(" ", "_").lower()


def extract_side_effects(desc):
    """The reference's __extract_side_effects, re-expressed row-at-a-time
    (parsers.py:927-977): ordered anchored match, first-match-wins,
    'activities' handling, and-list splitting, alias maps, excretion
    appends for patterns 5/6."""
    for i, rx in enumerate(DDI_PATTERNS):
        m = rx.match(desc or "")
        if m is None:
            continue
        se_name = m.group("se").lower()
        mode_name = MODE_MAP.get(m.group("mode"))
        if mode_name is None:
            return []
        has_activities = "activities" in se_name
        if has_activities:
            se_name = se_name.replace(" activities", "")
        if ", and" in se_name:
            items = [_sanitize_se(s) for s in se_name.replace("and", "").split(", ")]
        elif "and" in se_name:
            items = [_sanitize_se(s) for s in se_name.split(" and ")]
        else:
            items = [_sanitize_se(se_name)]
        if has_activities:
            items = [s + "_activities" for s in items]
        effects = [f"{mode_name}_{SE_NAME_MAP.get(s, s)}" for s in items]
        if i == 5:
            effects.append("decrease_excretion_rate")
        elif i == 6:
            effects.append("increase_excretion_rate")
        return effects
    return []


def scan(text, lexicon):
    """lexicon: list of (surface, entity_id, entity_type, priority)."""
    best = {}
    for surface, eid, etype, prio in lexicon:
        s = surface.lower()
        if s not in best or (prio, eid, etype) < best[s]:
            best[s] = (prio, eid, etype)
    found = []
    low = (text or "").lower()
    taken = set()
    for s in sorted(best, key=len, reverse=True):
        for m in re.finditer(_BOUND.format(re.escape(s)), low):
            if any(not (m.end() <= a or m.start() >= b) for a, b in taken):
                continue  # longer surface already claimed this span
            taken.add((m.start(), m.end()))
            _p, eid, etype = best[s]
            found.append((m.start(), s, eid, etype))
    return sorted(found)


def expected_outputs(rows, lexicon, mapping, ontology):
    """rows: list of dicts with conv_id/turn_idx/text; ontology: list of
    (entity_id, entity_type, pred, value). Returns dict of sets."""
    id_map = {}
    for src, _sns, dst, _dns in mapping:
        id_map.setdefault(src, []).append(dst)

    # top-level pathways: the ontology's pathway universe minus pathways
    # that appear as a child in the hierarchy (unknown pathways stay
    # MEMBER_OF_PATHWAY — matches taxonomy.top_level_pathways)
    pathway_ids = {eid for eid, ty, _p, _v in ontology if ty == "PATHWAY"}
    children = {eid for eid, _ty, pred, _v in ontology
                if pred == "HAS_PARENT_PATHWAY"}
    top_level = pathway_ids - children

    mentions = []  # (conv, turn, canonical, etype)
    for r in rows:
        for _pos, _s, eid, etype in scan(r["text"], lexicon):
            for cid in id_map.get(eid, [eid]):
                mentions.append((r["conv_id"], r["turn_idx"], cid, etype))

    metadata = {(f"{c}#{t}", "MENTIONS", e) for c, t, e, _ in mentions}

    per_turn = {}
    for c, t, e, ty in mentions:
        per_turn.setdefault((c, t), set()).add((e, ty))
    turn_ts = {(r["conv_id"], r["turn_idx"]): r["ts"] for r in rows}
    link_occ = {}  # (s, pred, o) -> list of (conv, ts) evidence
    for (c, t), ents in per_turn.items():
        ents = sorted(ents)
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                (e1, t1), (e2, t2) = ents[i], ents[j]
                if e1 == e2:
                    continue
                pred = TYPE_PAIR_PRED.get(frozenset([t1, t2]))
                if pred is None:
                    continue
                if pred in UNDIRECTED:
                    trip = (min(e1, e2), pred, max(e1, e2))
                else:
                    first = DIRECTED_FIRST[frozenset([t1, t2])]
                    s, o = (e1, e2) if t1 == first else (e2, e1)
                    if pred == "MEMBER_OF_PATHWAY" and o in top_level:
                        pred = "MEMBER_OF_TOP_LEVEL_PATHWAY"
                    trip = (s, pred, o)
                link_occ.setdefault(trip, []).append((c, turn_ts[(c, t)]))
    links = set(link_occ)
    links_prov = {
        trip
        + (
            len(occ),
            len({c for c, _ in occ}),
            min(ts for _, ts in occ),
            max(ts for _, ts in occ),
        )
        for trip, occ in link_occ.items()
    }

    # DDI side-effect quads (full 15-pattern cascade) with per-(pair, se)
    # direction-conflict exclusion
    turn_effects = {}
    for r in rows:
        fx = extract_side_effects(r["text"])
        if fx:
            turn_effects[(r["conv_id"], r["turn_idx"])] = fx
    ddi_raw = set()
    for (c, t), ents in per_turn.items():
        fx = turn_effects.get((c, t))
        if not fx:
            continue
        drugs = sorted({e for e, ty in ents if ty == "DRUG"})
        for i in range(len(drugs)):
            for j in range(i + 1, len(drugs)):
                for eff in fx:
                    ddi_raw.add((drugs[i], drugs[j], eff))
    by_pair_se = {}
    for d1, d2, eff in ddi_raw:
        se = re.sub(r"^(increase|decrease)_", "", eff)
        by_pair_se.setdefault((d1, d2, se), set()).add(eff)
    quads = set()
    for d1, d2, eff in ddi_raw:
        se = re.sub(r"^(increase|decrease)_", "", eff)
        if len(by_pair_se[(d1, d2, se)]) == 1:
            quads.add((d1, "DRUG_INTERACTION", d2, eff))

    # extended drug-protein action quads (rel cue + PubMed refs)
    action_quads = set()
    for r in rows:
        hit = None
        for rx, rel, act in ACTION_CUES:
            if rx.search(r["text"] or ""):
                hit = (rel, act)
                break
        if hit is None:
            continue
        refs = ",".join(PUBMED_RX.findall(r["text"] or "")) or None
        ents = per_turn.get((r["conv_id"], r["turn_idx"]), set())
        drugs = [e for e, ty in ents if ty == "DRUG"]
        prots = [e for e, ty in ents if ty == "PROTEIN"]
        for d in drugs:
            for p in prots:
                action_quads.add((d, hit[0], p, hit[1], refs))

    # protein-expression level quads
    expr_quads = set()
    for r in rows:
        m = EXPRESSION_RX.search(r["text"] or "")
        if m is None or m.group(2).upper() not in ("LOW", "MEDIUM", "HIGH"):
            continue
        ents = per_turn.get((r["conv_id"], r["turn_idx"]), set())
        for e, ty in ents:
            if ty == "PROTEIN":
                expr_quads.add(
                    (e, "PROTEIN_EXPRESSED_IN", f"TISSUE:{m.group(1)}", m.group(2).upper())
                )

    # organism-qualified phosphorylation quads (surface-position resolve)
    surface_to_prot = {}
    for surface, eid, etype, _prio in lexicon:
        if etype == "PROTEIN":
            surface_to_prot[surface.lower()] = eid
    phos_quads = set()
    for r in rows:
        m = PHOS_RX.match(r["text"] or "")
        if m is None:
            continue
        kin = surface_to_prot.get(m.group(1).lower())
        sub = surface_to_prot.get(m.group(3).lower())
        if kin is None or sub is None:
            continue
        phos_quads.add(
            (kin, "PHOSPHORYLATES", sub, m.group(5), m.group(2), m.group(4))
        )

    # ontology routing: TREE/ATC expansion + per-type vocabulary split
    # (the reference's per-file fan-out, compile_biokg.py:292-314)
    properties = set()
    for eid, etype, pred, value in ontology:
        if pred == "TREE":
            parts = value.split(".")
            for i in range(1, len(parts) + 1):
                properties.add((eid, "TREE_PREFIX", ".".join(parts[:i])))
        elif pred == "ATC":
            # reference parsers.py:1036-1049: the 1/3/4/5/7-char prefixes
            for n in (1, 3, 4, 5, 7):
                properties.add((eid, "DRUG_ATC_CODE", f"ATC:{value[:n]}"))
        elif pred in ORACLE_PROPERTY_VOCAB.get(etype, ()):
            properties.add((eid, pred, value))
        elif pred in ORACLE_METADATA_VOCAB.get(etype, ()):
            metadata.add((eid, pred, value))
        else:
            raise ValueError(f"oracle: predicate {pred!r} unknown for {etype!r}")

    # per-species PPI fan-out (reference write_ppi_by_species,
    # compile_biokg.py:215-272): both endpoints mapped -> same-species
    # bucket or INTERSPECIES; unmapped endpoints skipped
    species_map = {eid: value for eid, _ty, pred, value in ontology
                   if pred == "SPECIES"}
    ppi_by_species = set()
    for s, pred, o in links:
        if pred != "PPI" or s not in species_map or o not in species_map:
            continue
        ss, os_ = species_map[s], species_map[o]
        bucket = ss if ss == os_ else "INTERSPECIES"
        ppi_by_species.add((s, "PPI", o, bucket))

    return {
        "metadata": metadata,
        "links": links,
        "links_prov": links_prov,
        "quads": quads,
        "action_quads": action_quads,
        "expr_quads": expr_quads,
        "phos_quads": phos_quads,
        "properties": properties,
        "ppi_by_species": ppi_by_species,
    }


def precision_recall(actual: set, expected: set) -> tuple[float, float]:
    if not actual and not expected:
        return 1.0, 1.0
    tp = len(actual & expected)
    p = tp / len(actual) if actual else 0.0
    r = tp / len(expected) if expected else 0.0
    return p, r
