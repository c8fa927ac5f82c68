from biokg_spark.streaming.events import streaming_mention_counts

__all__ = ["streaming_mention_counts"]
