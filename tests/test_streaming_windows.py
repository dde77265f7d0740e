"""Batch/streaming agreement for event-time windowed aggregation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from youtube_scraper_db_spark.streaming import windowed_event_counts

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _events(spark):
    base = dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone.utc)
    rows = [
        (base + dt.timedelta(minutes=m), etype)
        for m, etype in [
            (0, "view"), (10, "view"), (30, "click"),
            (65, "view"),  # next hour
            (50, "view"),  # late-ish arrival, still hour 1
            (130, "click"),  # hour 3
        ]
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _canon(rows):
    return sorted((r.window_start, r.event_type, r.n_events) for r in rows)


def test_batch_windowed_counts(spark):
    got = _canon(windowed_event_counts(_events(spark), duration="1 hour").collect())
    h = dt.datetime(2024, 1, 1, 10, 0)
    assert got == [
        (h, "click", 1),
        (h, "view", 3),
        (h + dt.timedelta(hours=1), "view", 1),
        (h + dt.timedelta(hours=2), "click", 1),
    ]


def test_stream_matches_batch(spark, tmp_path):
    events = _events(spark)
    src = tmp_path / "events_src"
    events.write.parquet(str(src))

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    windowed = windowed_event_counts(stream, duration="1 hour")

    collected: list = []

    def sink(batch, epoch_id):
        collected.extend(batch.collect())

    (
        windowed.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert _canon(collected) == _canon(
        windowed_event_counts(events, duration="1 hour").collect()
    )
