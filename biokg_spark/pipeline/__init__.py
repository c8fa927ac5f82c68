from biokg_spark.pipeline.kg import (
    LINK_PREDICATES,
    PREDICATE_VOCABULARY,
    KGPipeline,
    cooccurrence_links,
)

__all__ = [
    "KGPipeline",
    "PREDICATE_VOCABULARY",
    "LINK_PREDICATES",
    "cooccurrence_links",
]
