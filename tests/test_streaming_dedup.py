"""streaming/dedup.py — first-arrival-wins on a stream, batch/stream
agreement, and duplicate suppression across micro-batches."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from youtube_scraper_db_spark.streaming import dedup_stream

SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _rows(spark, rows):
    data = [
        (vid, dt.datetime(2024, 1, 1, 10, m, tzinfo=dt.timezone.utc), p)
        for vid, m, p in rows
    ]
    return spark.createDataFrame(data, SCHEMA)


def test_batch_dedup(spark):
    df = _rows(spark, [("a", 0, "x"), ("a", 5, "y"), ("b", 1, "z")])
    got = dedup_stream(df, ["video_id"]).collect()
    assert sorted(r.video_id for r in got) == ["a", "b"]


def test_stream_dedup_across_microbatches(spark, tmp_path):
    # two source files → two micro-batches; 'a' repeats in both
    batch1 = _rows(spark, [("a", 0, "x"), ("b", 1, "z")])
    batch2 = _rows(spark, [("a", 5, "y"), ("c", 6, "w")])
    src = tmp_path / "src"
    batch1.coalesce(1).write.parquet(str(src / "f1"))
    batch2.coalesce(1).write.parquet(str(src / "f2"))

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "*"))
    deduped = dedup_stream(stream, ["video_id"], watermark="10 minutes")

    collected: list = []

    def sink(batch, epoch_id):
        collected.extend(batch.collect())

    (
        deduped.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert sorted(r.video_id for r in collected) == ["a", "b", "c"]
