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
    frozenset(["PROTEIN", "PATHWAY"]): "MEMBER_OF_PATHWAY",
    frozenset(["DRUG", "PATHWAY"]): "DRUG_PATHWAY_ASSOCIATION",
    frozenset(["DISEASE", "PATHWAY"]): "DISEASE_PATHWAY_ASSOCIATION",
}
DIRECTED_FIRST = {
    "DPI": "DRUG",
    "DRUG_DISEASE_ASSOCIATION": "DRUG",
    "PROTEIN_DISEASE_ASSOCIATION": "PROTEIN",
    "MEMBER_OF_PATHWAY": "PROTEIN",
    "DRUG_PATHWAY_ASSOCIATION": "DRUG",
    "DISEASE_PATHWAY_ASSOCIATION": "DISEASE",
}
EFFECT_CASCADE = [
    (re.compile(r"\bincreases\b"), "INCREASES"),
    (re.compile(r"\bdecreases\b"), "DECREASES"),
    (re.compile(r"\baffects\b"), "AFFECTS"),
]
_BOUND = r"(?<![A-Za-z0-9_]){}(?![A-Za-z0-9_])"


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
    """rows: list of dicts with conv_id/turn_idx/text. Returns dict of sets."""
    id_map = {}
    for src, _sns, dst, _dns in mapping:
        id_map.setdefault(src, []).append(dst)

    mentions = []  # (conv, turn, canonical, etype)
    for r in rows:
        for _pos, _s, eid, etype in scan(r["text"], lexicon):
            for cid in id_map.get(eid, [eid]):
                mentions.append((r["conv_id"], r["turn_idx"], cid, etype))

    metadata = {(f"{c}#{t}", "MENTIONS", e) for c, t, e, _ in mentions}

    per_turn = {}
    for c, t, e, ty in mentions:
        per_turn.setdefault((c, t), set()).add((e, ty))
    links = set()
    for ents in per_turn.values():
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
                    links.add((min(e1, e2), pred, max(e1, e2)))
                else:
                    first = DIRECTED_FIRST[pred]
                    s, o = (e1, e2) if t1 == first else (e2, e1)
                    links.add((s, pred, o))

    # DPI effect quads with conflict exclusion
    effects = {}
    for r in rows:
        for rx, label in EFFECT_CASCADE:
            if rx.search(r["text"] or ""):
                effects[(r["conv_id"], r["turn_idx"])] = label
                break
    dpi = set()
    for (c, t), ents in per_turn.items():
        eff = effects.get((c, t))
        if not eff:
            continue
        drugs = [e for e, ty in ents if ty == "DRUG"]
        prots = [e for e, ty in ents if ty == "PROTEIN"]
        for d in drugs:
            for p in prots:
                dpi.add((d, p, eff, f"{c}#{t}"))
    by_pair = {}
    for d, p, eff, ref in dpi:
        by_pair.setdefault((d, p), set()).add(eff)
    quads = set()
    for d, p, eff, _ref in dpi:
        dirs = by_pair[(d, p)] & {"INCREASES", "DECREASES"}
        if eff == "AFFECTS" or len(dirs) == 1:
            quads.add((d, "DPI_EFFECT", p, eff))

    properties = set()
    for eid, pred, value in ontology:
        if pred in ("NAME", "TYPE"):
            properties.add((eid, pred, value))
        elif pred == "TREE":
            parts = value.split(".")
            for i in range(1, len(parts) + 1):
                properties.add((eid, "TREE_PREFIX", ".".join(parts[:i])))

    return {
        "metadata": metadata,
        "links": links,
        "quads": quads,
        "properties": properties,
    }


def precision_recall(actual: set, expected: set) -> tuple[float, float]:
    if not actual and not expected:
        return 1.0, 1.0
    tp = len(actual & expected)
    p = tp / len(actual) if actual else 0.0
    r = tp / len(expected) if expected else 0.0
    return p, r
