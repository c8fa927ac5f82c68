"""Pin the DDI cascade contract against silent drift.

The 15 pattern strings and the two normalization maps in
``functions/cascade.py`` are the reference's behavioral CONTRACT (carried
verbatim from /root/reference/biokg/processing/parsers.py:24-82, the same
way the predicate vocabulary is carried). Both the Spark form and the
generated DuckDB oracle derive from those tables, so a transcription
error in the DATA would propagate to both sides of the correctness gate
unchecked. This test holds an INDEPENDENT checked-in copy and asserts
byte-equality — any future edit to the engine's tables must consciously
touch this file too.
"""

from biokg_spark.functions.cascade import (
    DDI_MODE_NORM,
    DDI_SE_ALIASES,
    DDI_SE_PATTERNS,
)

# Verbatim copy of reference parsers.py:24-45 (DDI_SIDE_EFFECT_1..15, in
# DDI_SIDE_EFFECTS list order).
REFERENCE_PATTERNS = [
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
]

# Verbatim copy of reference parsers.py:47-54 (DDI_MODE_MAP).
REFERENCE_MODE_MAP = {
    "reduced": "decrease",
    "increase": "increase",
    "higher": "increase",
    "decrease": "decrease",
    "reduce": "decrease",
    "lower": "decrease",
}

# Verbatim copy of reference parsers.py:56-82 (DDI_SE_NAME_MAP; the
# source lists 'neutropenic_activities' twice with the same value — a
# Python dict keeps one entry, so the dict form below is the contract).
REFERENCE_SE_NAME_MAP = {
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


def test_patterns_pinned():
    assert len(DDI_SE_PATTERNS) == 15
    for i, (ours, ref) in enumerate(zip(DDI_SE_PATTERNS, REFERENCE_PATTERNS)):
        assert ours == ref, f"pattern {i} drifted from the reference contract"


def test_mode_map_pinned():
    assert DDI_MODE_NORM == REFERENCE_MODE_MAP


def test_se_alias_map_pinned():
    assert DDI_SE_ALIASES == REFERENCE_SE_NAME_MAP


def test_oracle_module_copies_pinned():
    """tests/oracle_kg.py carries its own independent copy — pin it to the
    same contract so the golden comparison can't drift either."""
    from tests import oracle_kg

    assert [r.pattern for r in oracle_kg.DDI_PATTERNS] == REFERENCE_PATTERNS
    assert oracle_kg.MODE_MAP == REFERENCE_MODE_MAP
    assert oracle_kg.SE_NAME_MAP == REFERENCE_SE_NAME_MAP
