"""Stream-stream interval join: agreement with the batch twin and
interval-bound semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from youtube_scraper_db_spark.streaming.joins import correlate_streams

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ]
)

BASE = dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone.utc)


def _views(spark):
    rows = [
        (BASE, 1, 100),
        (BASE + dt.timedelta(minutes=30), 2, 101),
        (BASE + dt.timedelta(hours=3), 1, 102),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _clicks(spark):
    rows = [
        (BASE + dt.timedelta(minutes=20), 1, 200),   # within 1h of view 100
        (BASE + dt.timedelta(minutes=90), 2, 201),   # 60 min after 101 → in
        (BASE + dt.timedelta(hours=2), 1, 202),      # 2h after 100 → out
        (BASE + dt.timedelta(hours=3, minutes=10), 1, 203),  # matches 102
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _canon(rows):
    return sorted((r.l_event_id, r.r_event_id) for r in rows)


EXPECTED = [(100, 200), (101, 201), (102, 203)]


def test_batch_twin_semantics(spark):
    got = correlate_streams(_views(spark), _clicks(spark), on="user_id").collect()
    assert _canon(got) == EXPECTED


def test_stream_stream_matches_batch(spark, tmp_path):
    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    _views(spark).write.parquet(vsrc)
    _clicks(spark).write.parquet(csrc)
    vstream = spark.readStream.schema(SCHEMA).parquet(vsrc)
    cstream = spark.readStream.schema(SCHEMA).parquet(csrc)

    joined = correlate_streams(vstream, cstream, on="user_id")
    assert joined.isStreaming

    collected: list = []
    q = (
        joined.writeStream.foreachBatch(
            lambda batch, _eid: collected.extend(batch.collect())
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _canon(collected) == EXPECTED
