"""Stream source layout-robustness + _run_stream hygiene (round-3 ADVICE).

``read_table_stream`` must read a table whether the driver writes it as a
single ``name.parquet`` FILE (current layout) or a ``name.parquet/``
DIRECTORY of part files (any standard ``df.write.parquet`` output) —
``pathGlobFilter`` matches leaf file names only, so the directory layout
previously produced a silently EMPTY stream. ``_run_stream`` must leave
the session exactly as it found it: shuffle width, state-store provider,
no leaked memory-sink temp views.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from youtube_scraper_db_spark import registry
from youtube_scraper_db_spark.io import read_table_stream

SF = "/root/testdata/sf0.001"


def _drain(df, qname, ckpt):
    q = (
        df.writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(qname)


def test_directory_style_table_streams(spark, tmp_path):
    # re-materialize orders as a directory-of-part-files table
    sf_dir = str(tmp_path / "sf")
    batch = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    batch.repartition(3).write.parquet(os.path.join(sf_dir, "orders.parquet"))
    stream = read_table_stream(spark, sf_dir, "orders")
    got = _drain(
        stream.select("o_orderkey"), "dirstyle_probe", str(tmp_path / "ckpt")
    ).count()
    assert got == batch.count()


def test_single_file_table_streams(spark, tmp_path):
    stream = read_table_stream(spark, SF, "orders")
    got = _drain(
        stream.select("o_orderkey"), "filestyle_probe", str(tmp_path / "ckpt2")
    ).count()
    assert got == spark.read.parquet(os.path.join(SF, "orders.parquet")).count()


def test_run_stream_restores_session_and_cleans_up(spark):
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    before_parts = spark.conf.get("spark.sql.shuffle.partitions")
    before_provider = spark.conf.get(provider_key, None)
    before_tables = {t.name for t in spark.catalog.listTables()}

    stream = read_table_stream(spark, SF, "events").select("event_id", "user_id")
    out = registry._run_stream(stream, state_partitions=2)
    assert out.count() > 0
    # output survives the temp-view drop (materialized before cleanup)
    assert out.select(F.count("*")).first()[0] == out.count()

    assert spark.conf.get("spark.sql.shuffle.partitions") == before_parts
    assert spark.conf.get(provider_key, None) == before_provider
    after_tables = {t.name for t in spark.catalog.listTables()}
    assert not {t for t in after_tables - before_tables if t.startswith("mem_")}
    out.unpersist()
