"""Structured Streaming / incremental processing."""

from .incremental import (
    batch_consume_increment,
    deduped_event_stream,
    hourly_event_counts,
    run_incremental_stream,
    stream_events,
)
from .joins import (
    purchase_click_attribution,
    stream_interval_join,
)
from .sessions import (
    run_session_stream,
    sessionize_batch,
    sessionize_stream,
)

__all__ = [
    "batch_consume_increment",
    "deduped_event_stream",
    "hourly_event_counts",
    "purchase_click_attribution",
    "run_incremental_stream",
    "run_session_stream",
    "sessionize_batch",
    "sessionize_stream",
    "stream_events",
    "stream_interval_join",
]
