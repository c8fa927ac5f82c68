from biokg_spark.streaming.events import (
    sessionize_conversations,
    streaming_mention_counts,
)

__all__ = ["streaming_mention_counts", "sessionize_conversations"]
