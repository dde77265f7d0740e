"""Structured Streaming surface (SURVEY.md §2.9)."""

from .dedup import dedup_stream
from .enrich import enrich_stream
from .joins import correlate_streams
from .inbox import read_inbox_stream, run_inbox_once
from .windows import windowed_event_counts

__all__ = [
    "dedup_stream",
    "enrich_stream",
    "correlate_streams",
    "read_inbox_stream",
    "run_inbox_once",
    "windowed_event_counts",
]
