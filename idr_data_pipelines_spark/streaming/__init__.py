"""Structured Streaming surface: event drain, republish, windowed aggs."""

from idr_data_pipelines_spark.streaming.events import (
    drain_available_now,
    republish,
    windowed_event_counts,
    sessionize,
)

__all__ = [
    "drain_available_now",
    "republish",
    "windowed_event_counts",
    "sessionize",
]
