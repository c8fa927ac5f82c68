from biokg_spark.pipeline.kg import LINK_PREDICATES, PREDICATE_VOCABULARY, KGPipeline

__all__ = ["KGPipeline", "PREDICATE_VOCABULARY", "LINK_PREDICATES"]
