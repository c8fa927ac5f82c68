"""Property-based tests (hypothesis) for the pure-Python kernels.

These run without Spark: the MentionScanner backends and the cascade
extractor are plain objects, so hypothesis can hammer them cheaply.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from biokg_spark.functions.cascade import CascadeExtractor
from biokg_spark.operators.mentions import MentionScanner

WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
TEXT = st.lists(
    st.one_of(WORD, st.sampled_from(["alpha", "beta", "gamma", "alphabet"])),
    min_size=0,
    max_size=20,
).map(" ".join)

LEXICON = [
    ("alpha", "E1", "T1", 0),
    ("beta", "E2", "T2", 0),
    ("alphabet", "E3", "T3", 0),  # superstring of alpha: longest-wins cases
    ("gamma", "E4", "T4", 1),
]


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_all_backends_agree(text):
    rx = MentionScanner(LEXICON, backend="regex")
    ac = MentionScanner(LEXICON, backend="ac")
    dc = MentionScanner(LEXICON, backend="dict")  # lexicon is single-token
    assert rx.scan_text(text) == ac.scan_text(text) == dc.scan_text(text)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_scan_matches_are_word_bounded_and_longest(text):
    sc = MentionScanner(LEXICON, backend="ac")
    low = text.lower()
    for start, entry in sc.scan_text(text):
        end = start + len(entry.surface)
        assert low[start:end] == entry.surface
        assert start == 0 or not re.match(r"[A-Za-z0-9_]", low[start - 1])
        assert end == len(low) or not re.match(r"[A-Za-z0-9_]", low[end])
        # longest-at-start: no other surface longer than this one also
        # matches at this offset with a valid right boundary
        for other in ("alpha", "beta", "gamma", "alphabet"):
            if len(other) > len(entry.surface) and low.startswith(other, start):
                oend = start + len(other)
                assert oend < len(low) and re.match(r"[A-Za-z0-9_]", low[oend]), (
                    f"longer surface {other!r} was available at {start}"
                )


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc XYZ.,", max_size=60))
def test_cascade_first_match_invariant(text):
    ex = CascadeExtractor(
        [r"(?P<v>abc)", r"(?P<v>ab)", r"(?P<v>a)"], {"v": "v"}
    )
    hit = ex.extract_one(text)
    low = text.lower()
    if hit is None:
        assert "a" not in low
    else:
        idx = hit[0]
        # every earlier pattern must NOT match anywhere in the string
        for i in range(idx):
            assert ex._rx()[i].search(text) is None
