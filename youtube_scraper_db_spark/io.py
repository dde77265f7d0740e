"""Parquet-backed table IO (SURVEY.md §2.1 S1, S16).

Reads are plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
column pruning and row-group skipping; writes default to snappy parquet.
Schema evolution (ref main_scraper.py:244-251 PRAGMA+ALTER) maps to
``mergeSchema`` on read and additive ``unionByName(allowMissingColumns)``
on write — see ``evolve_schema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table (S1). Pushdown/pruning come from Catalyst.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it via the sanctioned
    ``legacy.parquet.nanosAsLong`` path and rebuild a microsecond
    TimestampType column (truncation — matching how DuckDB/pandas narrow
    ns → µs).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver testdata table as a dict of DataFrames."""
    return {name: read_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for the SQL API."""
    for name, df in load_testdata(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist a table as parquet (snappy)."""
    df.write.mode(mode).parquet(path)


def evolve_schema(old: DataFrame, new: DataFrame) -> DataFrame:
    """Additive schema evolution (S16): union tolerating columns present on
    only one side — the Spark analogue of ``ALTER TABLE ADD COLUMN`` at
    ref main_scraper.py:244-251 / update_playlists_metadata.py:44-52."""
    return old.unionByName(new, allowMissingColumns=True)
