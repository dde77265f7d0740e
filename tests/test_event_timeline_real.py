"""Real-parquet coverage for the event-timeline queries (VERDICT r02 #8).

These three queries (EXT-movingwin, EXT-delta, EXT-bandjoin) broke in
round 2 because only the repo-wide plan lint exercised them against the
real driver testdata — conftest fixtures use createDataFrame and never
see the parquet encodings. This module runs them on
/root/testdata/sf0.001 and asserts semantic invariants, so the
real-parquet path has value-level (not just plan-shape) coverage.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from youtube_scraper_db_spark import registry

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@needs_testdata
def test_event_user_moving_avg_real(spark):
    df = registry.event_user_moving_avg(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"event_id", "user_id", "avg_7d"}
    # every 7-day trailing mean must lie within the per-user value range
    ev = registry._t(spark, SF_DIR, "events")
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = bounds[r.user_id]
        assert lo - 1e-9 <= r.avg_7d <= hi + 1e-9, r


@needs_testdata
def test_event_value_delta_real(spark):
    df = registry.event_value_delta(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    # gaps are between consecutive same-user events: non-negative always
    assert all(r.gap_sec is None or r.gap_sec >= 0 for r in rows)
    # per user, exactly one first event with NULL delta/gap
    ev = registry._t(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(1 for r in rows if r.gap_sec is None) == n_users


@needs_testdata
def test_event_neighbor_counts_real(spark):
    df = registry.event_neighbor_counts(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    # neighbors exclude the event itself, so counts are >= 0
    assert all(r.n_neighbors >= 0 for r in rows)
    # cross-check one user against a brute-force self-join on the same data
    ev = registry._t(spark, SF_DIR, "events")
    uid = ev.select("user_id").first().user_id
    a = ev.filter(F.col("user_id") == uid).select(
        F.col("event_id").alias("eid"), F.col("ts").cast("long").alias("es")
    )
    b = a.select(F.col("eid").alias("oid"), F.col("es").alias("os"))
    brute = {
        r.eid: r.n
        for r in a.join(b, (F.abs(a.es - b.os) <= 3600) & (a.eid != b.oid), "left")
        .groupBy("eid")
        .agg(F.count("oid").alias("n"))
        .collect()
    }
    got = {r.event_id: r.n_neighbors for r in rows if r.user_id == uid}
    assert got == brute
