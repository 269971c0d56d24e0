"""Structured Streaming surface: event drain, republish, windowed aggs,
stateful sessionization."""

from idr_data_pipelines_spark.streaming.events import (
    dedup_stream_exact,
    drain_available_now,
    handle_event,
    republish,
    cdc_upsert_drain,
    funnel_depth,
    sessionize,
    sessionize_stream,
    windowed_event_counts,
)

__all__ = [
    "dedup_stream_exact",
    "drain_available_now",
    "handle_event",
    "republish",
    "cdc_upsert_drain",
    "funnel_depth",
    "sessionize",
    "sessionize_stream",
    "windowed_event_counts",
]
