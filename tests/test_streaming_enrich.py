"""Stream-static enrichment: agreement with the batch join, broadcast
plan shape, and rejection of stream-unsafe join types."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from youtube_scraper_db_spark.streaming import enrich_stream

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _events(spark):
    base = dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone.utc)
    rows = [
        (base + dt.timedelta(minutes=m), uid, etype)
        for m, uid, etype in [
            (0, 1, "view"),
            (5, 2, "click"),
            (10, 3, "view"),  # user 3 has no dim row
            (15, 1, "purchase"),
        ]
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _dim(spark):
    return spark.createDataFrame(
        [(1, "gold"), (2, "basic")], ["user_id", "tier"]
    )


def _canon(rows):
    return sorted((r.user_id, r.event_type, r.tier) for r in rows)


def test_stream_matches_batch_join(spark, tmp_path):
    events, dim = _events(spark), _dim(spark)
    src = tmp_path / "events_src"
    events.write.parquet(str(src))

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    enriched = enrich_stream(stream, dim, on="user_id", how="left")

    collected: list = []
    q = (
        enriched.writeStream.foreachBatch(
            lambda batch, _eid: collected.extend(batch.collect())
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    expected = _canon(events.join(dim, "user_id", "left").collect())
    assert _canon(collected) == expected
    # the no-dim user survives the left join with a NULL tier
    assert (3, "view", None) in _canon(collected)


def test_static_side_broadcasts(spark, tmp_path):
    import contextlib
    import io

    events = _events(spark)
    src = tmp_path / "events_bcast"
    events.write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    enriched = enrich_stream(stream, _dim(spark), on="user_id")

    q = enriched.writeStream.format("noop").trigger(availableNow=True).start()
    q.awaitTermination(120)
    # the micro-batch physical plan lives on the query, not on the
    # foreachBatch DataFrame (which arrives pre-materialized)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain()
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rejects_stream_unsafe_how(spark):
    with pytest.raises(ValueError, match="not stream-static safe"):
        enrich_stream(_events(spark), _dim(spark), on="user_id", how="full")
