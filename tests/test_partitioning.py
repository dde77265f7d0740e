"""Partitioned layout: directory pruning reaches the scan node and the
pruned files are never listed as inputs."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from youtube_scraper_db_spark.io import read_table
from youtube_scraper_db_spark.operators.partitioning import (
    read_partitioned,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def test_partition_filters_prune_directories(spark, tmp_path):
    events = read_table(spark, SF, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, ["event_type"])

    t = read_partitioned(spark, path)
    assert t.count() == events.count()  # layout is lossless

    q = t.where(F.col("event_type") == "click")
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), plan[:600]

    # the scan's file index only surfaces the matching directory
    files = [r.f for r in q.select(F.input_file_name().alias("f")).distinct().collect()]
    assert files and all("event_type=click" in f for f in files)

    # row-level agreement with the unpartitioned source
    want = events.where(F.col("event_type") == "click").count()
    assert q.count() == want


def test_partitioned_write_is_preclustered(spark, tmp_path):
    import glob

    events = read_table(spark, SF, "events")
    path = str(tmp_path / "clustered")
    write_partitioned(events, path, ["event_type"])
    # one file per partition directory (pre-shuffle on the key), not one
    # file per input task — the small-file guard
    for d in glob.glob(f"{path}/event_type=*"):
        n = len(glob.glob(f"{d}/*.parquet"))
        assert n == 1, (d, n)
