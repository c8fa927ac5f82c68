from biokg_spark.datagen.transcripts import (
    entity_lexicon,
    id_mapping,
    ontology,
    transcripts,
)

__all__ = ["transcripts", "entity_lexicon", "id_mapping", "ontology"]
