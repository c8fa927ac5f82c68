from biokg_spark.functions.text import (
    STOPWORDS,
    doc_fingerprint,
    lang_id,
    quality_score,
    sanitize_text,
    token_count,
)

__all__ = [
    "STOPWORDS",
    "sanitize_text",
    "token_count",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
]
