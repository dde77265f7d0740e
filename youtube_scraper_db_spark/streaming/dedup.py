"""Streaming deduplication — exactly-once-per-key ingestion with bounded
state.

An ingestion stream (re-scraped playlists, re-delivered transcript
files, at-least-once upstream queues) re-emits the same logical row; the
sink must see it once. On a stream, plain ``dropDuplicates`` keeps every
key ever seen in state — unbounded growth, the streaming scale-killer.
``dropDuplicatesWithinWatermark`` instead evicts key state once the
event-time watermark passes it: duplicates are only ever re-delivered
within some bounded lateness in practice, so state is
O(keys per watermark horizon), independent of stream lifetime.

Batch twin: the identical call site degrades to ``dropDuplicates`` —
same semantics when the whole input is one "batch epoch" — preserving
the backfill-IS-the-streaming-query property of streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per key; on streams, forget keys once the
    watermark guarantees no more duplicates can arrive for them."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return df.dropDuplicates(key_cols)
