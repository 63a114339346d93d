"""Structured Streaming equivalents of the engine's batch operators."""

from cashback_data_pipeline_spark.streaming.jobs import (
    incremental_upsert_stream,
    read_events_stream,
    sessionized_counts_stream,
    windowed_counts_stream,
)

__all__ = [
    "incremental_upsert_stream",
    "read_events_stream",
    "sessionized_counts_stream",
    "windowed_counts_stream",
]
