from biokg_spark.operators.mentions import MentionScanner, scan_mentions
from biokg_spark.operators.edges import (
    canonical_undirected,
    conflict_exclusion,
    union_refs,
)
from biokg_spark.operators.hierarchy import expand_prefixes
from biokg_spark.operators.skew import salt_join

__all__ = [
    "MentionScanner",
    "scan_mentions",
    "canonical_undirected",
    "conflict_exclusion",
    "union_refs",
    "expand_prefixes",
    "salt_join",
]
