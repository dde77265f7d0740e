"""Structured Streaming surface (SURVEY.md §2.9)."""

from .inbox import read_inbox_stream, run_inbox_once

__all__ = ["read_inbox_stream", "run_inbox_once"]
