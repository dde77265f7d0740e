"""Event-time windowed aggregation, shared by batch and streaming
(SURVEY.md §2.9 extension territory; the batch twins live in the registry
as ``hourly_event_rollup`` / ``sessionized_events``).

``F.window`` builds the same tumbling/sliding buckets under both execution
modes, so one function serves micro-batch streams (with a watermark
bounding state) and batch backfills (watermark ignored) — the
Kappa-architecture property that matters operationally: the backfill query
IS the streaming query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` differs) event-time counts.

    Streaming input: the watermark bounds aggregation state and admits
    late rows up to the bound (late-data semantics). Batch input: Spark
    ignores ``withWatermark``, so the identical call does the backfill.
    At scale the aggregation is a hash agg with map-side combine; state
    size is windows × groups, independent of event volume.
    """
    src = events
    if watermark and events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    win = F.window(ts_col, duration, slide) if slide else F.window(ts_col, duration)
    return (
        src.groupBy(win.alias("win"), *group_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
        )
    )
