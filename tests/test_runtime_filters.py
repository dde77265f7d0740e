"""Runtime (bloom) filter injection — the row-level join pruning a 100 TB
fact-dim join lives on when the dim side is too big to broadcast.

Spark injects `bloom_filter_agg` on the (filtered) creation side and a
`might_contain` predicate into the fact scan when
`spark.sql.optimizer.runtime.bloomFilter.enabled` is on and the
application side exceeds its scan-size threshold. The threshold defaults
to 10GB — correct for clusters, far above the test data — so the test
lowers it; production sessions should keep the default and simply enable
the flag (it is off by default in Spark 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_scraper_db_spark.io import read_table

SF = "/root/testdata/sf0.01"

CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ path
}


def _with_confs(spark, confs):
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_runtime_filter_reaches_fact_scan(spark):
    old = _with_confs(spark, CONFS)
    try:
        li = read_table(spark, SF, "lineitem")
        dim = (
            read_table(spark, SF, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        j = li.join(dim, li.l_orderkey == dim.o_orderkey).select(
            "l_orderkey", "l_quantity"
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = j._jdf.queryExecution().explainString(mode)
        assert "might_contain" in plan, plan[:800]
        assert "bloom_filter_agg" in plan
        # and the result is unchanged by the filter
        n_with = j.count()
    finally:
        _restore(spark, old)
    n_without = (
        read_table(spark, SF, "lineitem")
        .join(
            read_table(spark, SF, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert n_with == n_without
