"""Structured Streaming surface (north-star; the reference has none)."""

from sparksearchengine_spark.streaming.stream import (
    compact_incremental_index,
    dedup_stream,
    incremental_index,
    load_incremental_index,
    neardup_filter_stream,
    read_document_stream,
    running_user_stats,
    sessionize,
    stream_postings,
    trending_keys,
    windowed_event_counts,
)

__all__ = [
    "compact_incremental_index",
    "dedup_stream",
    "incremental_index",
    "load_incremental_index",
    "neardup_filter_stream",
    "read_document_stream",
    "running_user_stats",
    "sessionize",
    "stream_postings",
    "trending_keys",
    "windowed_event_counts",
]
