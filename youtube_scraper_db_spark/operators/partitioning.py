"""Hive-style partitioned layout — directory-level pruning for the
columns every query filters on.

Bucketing (operators/bucketing.py) co-locates JOIN keys; Z-order
(operators/layout.py) tightens file-level min/max stats; PARTITIONING is
the third layout tool: low-cardinality, always-filtered columns (ingest
date, event type, language) become directory keys, and a filter on them
never opens the excluded files at all — `PartitionFilters` in the scan,
zero I/O for pruned partitions, the backbone of every production lake.

Rules of thumb encoded here:
- partition count is bounded (directories are metadata load: aim for
  ≤ O(10⁴) partitions, each ≥ ~1 GB at cluster scale);
- repartition on the partition keys before the write so each partition
  directory gets ONE file per shuffle partition instead of one file per
  input task (the small-file explosion `Archive.compact` exists to fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, keys: list[str]) -> None:
    """Write ``df`` under ``path`` partitioned by ``keys`` (in order),
    pre-clustered so each partition directory holds contiguous files."""
    (
        df.repartition(*[F.col(k) for k in keys])
        .write.mode("overwrite")
        .partitionBy(*keys)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; partition-key filters applied by the
    caller prune at the directory level (check `PartitionFilters` in
    the scan node)."""
    return spark.read.parquet(path)
