"""Incremental rollup maintenance: batch-order invariance and agreement
with the from-scratch aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_scraper_db_spark.io import read_table
from youtube_scraper_db_spark.pipelines.incremental import (
    read_rollup,
    refresh_rollup,
    rollup_batch,
)

SF = "/root/testdata/sf0.001"


def _canon(df):
    rows = df.select(
        "day",
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("s"),
        F.round("min_value", 2).alias("mn"),
        F.round("max_value", 2).alias("mx"),
    ).collect()
    return sorted((r.day, r.event_type, r.n_events, r.s, r.mn, r.mx) for r in rows)


def test_incremental_equals_full_recompute(spark):
    events = read_table(spark, SF, "events")
    # three arbitrary ingest batches (hash-split so they're uneven)
    b1 = events.where(F.col("event_id") % 3 == 0)
    b2 = events.where(F.col("event_id") % 3 == 1)
    b3 = events.where(F.col("event_id") % 3 == 2)

    r = refresh_rollup(None, b1)
    r = refresh_rollup(r, b2)
    r = refresh_rollup(r, b3)

    assert _canon(r) == _canon(rollup_batch(events))


def test_merge_is_batch_order_invariant(spark):
    events = read_table(spark, SF, "events")
    b1 = events.where(F.col("event_id") % 2 == 0)
    b2 = events.where(F.col("event_id") % 2 == 1)
    fwd = refresh_rollup(refresh_rollup(None, b1), b2)
    rev = refresh_rollup(refresh_rollup(None, b2), b1)
    assert _canon(fwd) == _canon(rev)


def test_read_view_derives_avg(spark):
    events = read_table(spark, SF, "events")
    view = read_rollup(refresh_rollup(None, events))
    row = view.where(F.col("n_events") > 0).first()
    assert abs(row.avg_value - row.sum_value / row.n_events) < 1e-9


def test_incremental_distinct_sketch(spark):
    """Distinct users per (day, type) survive batch splits: the HLL
    sketches union across refreshes and the estimate matches the exact
    distinct count computed from the full history (2% rsd default —
    exact here because per-group cardinalities are tiny)."""
    events = read_table(spark, SF, "events")
    b1 = events.where(F.col("event_id") % 2 == 0)
    b2 = events.where(F.col("event_id") % 2 == 1)
    view = read_rollup(refresh_rollup(refresh_rollup(None, b1), b2))

    exact = (
        events.select(
            F.col("ts").cast("date").alias("day"), "event_type", "user_id"
        )
        .groupBy("day", "event_type")
        .agg(F.countDistinct("user_id").alias("exact_uniq"))
    )
    joined = view.join(exact, ["day", "event_type"]).select(
        "approx_uniq_users", "exact_uniq"
    )
    for r in joined.collect():
        assert abs(r.approx_uniq_users - r.exact_uniq) <= max(
            2, 0.05 * r.exact_uniq
        ), (r.approx_uniq_users, r.exact_uniq)
