"""as_of_join semantics + plan shape (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from youtube_scraper_db_spark.operators.asof import as_of_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), "a"),   # before any right row
            (2, _ts("2024-01-02 00:00:00"), "b"),   # exactly at r1 (inclusive)
            (3, _ts("2024-01-03 12:00:00"), "c"),   # between r1 and r2
            (4, _ts("2024-01-05 00:00:00"), "d"),   # after r2 (latest wins)
            (5, _ts("2024-01-04 00:00:00"), "e"),   # key with no right rows
        ],
        "event_id long, ts timestamp, tag string",
    ).withColumn("k", (F.col("event_id") <= 4).cast("int"))
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-02 00:00:00"), 100),
            (1, _ts("2024-01-04 00:00:00"), 200),
        ],
        "k int, rt timestamp, payload int",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _fixture(spark)
    out = {
        r.event_id: r.payload
        for r in as_of_join(
            left, right, key="k", left_ts="ts", right_ts="rt",
            payload_cols=["payload"],
        ).collect()
    }
    assert out[1] is None      # nothing at-or-before
    assert out[2] == 100       # inclusive at equal timestamp
    assert out[3] == 100       # carry-forward between right rows
    assert out[4] == 200       # latest right row wins
    assert out[5] is None      # unmatched key
    # all left rows survive (left join), schema keeps left columns
    assert len(out) == 5


def test_asof_join_single_shuffle(spark):
    left, right = _fixture(spark)
    plan = (
        as_of_join(
            left, right, key="k", left_ts="ts", right_ts="rt",
            payload_cols=["payload"],
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union + carry-forward window: exactly one key shuffle, no join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_asof_join_forward_semantics(spark):
    left, right = _fixture(spark)
    out = {
        r.event_id: r.payload
        for r in as_of_join(
            left, right, key="k", left_ts="ts", right_ts="rt",
            payload_cols=["payload"], direction="forward",
        ).collect()
    }
    assert out[1] == 100       # earliest at-or-after
    assert out[2] == 100       # inclusive at equal timestamp
    assert out[3] == 200       # next right row after the gap
    assert out[4] is None      # nothing follows the last right row
    assert out[5] is None      # unmatched key
    assert len(out) == 5


def test_asof_join_forward_single_shuffle(spark):
    left, right = _fixture(spark)
    plan = (
        as_of_join(
            left, right, key="k", left_ts="ts", right_ts="rt",
            payload_cols=["payload"], direction="forward",
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan
