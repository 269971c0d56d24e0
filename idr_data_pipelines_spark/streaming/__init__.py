"""Structured Streaming surface: event drain, republish, windowed aggs,
stateful sessionization."""

from idr_data_pipelines_spark.streaming.events import (
    drain_available_now,
    handle_event,
    republish,
    sessionize,
    sessionize_stream,
    windowed_event_counts,
)

__all__ = [
    "drain_available_now",
    "handle_event",
    "republish",
    "sessionize",
    "sessionize_stream",
    "windowed_event_counts",
]
