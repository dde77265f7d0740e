"""Stateful streaming sessionization (applyInPandasWithState)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from youtube_scraper_db_spark.streaming.sessions import sessionize_stream

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)

BASE = dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone.utc)


def test_sessionize_stream_closes_gapped_sessions(spark, tmp_path):
    rows = [
        # user 1: two sessions separated by a 2-hour gap
        (BASE, 1),
        (BASE + dt.timedelta(minutes=10), 1),
        (BASE + dt.timedelta(hours=2, minutes=10), 1),
        # user 2: one session
        (BASE + dt.timedelta(minutes=5), 2),
        # watermark pusher far in the future so earlier sessions time out
        (BASE + dt.timedelta(hours=10), 99),
    ]
    src = tmp_path / "events"
    spark.createDataFrame(rows, SCHEMA).write.parquet(str(src))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    sessions = sessionize_stream(stream, gap=dt.timedelta(minutes=30))

    collected: list = []
    (
        sessions.writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: collected.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in collected
    }
    naive = BASE.replace(tzinfo=None)
    # user 1 session A: 10:00-10:10 ×2; session B closed by timeout.
    assert (1, naive, naive + dt.timedelta(minutes=10), 2) in got
    assert (1, naive + dt.timedelta(hours=2, minutes=10),
            naive + dt.timedelta(hours=2, minutes=10), 1) in got
    assert (2, naive + dt.timedelta(minutes=5),
            naive + dt.timedelta(minutes=5), 1) in got
