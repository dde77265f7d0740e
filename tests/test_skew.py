"""Salted skew operators must be result-equivalent to the unsalted forms."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from youtube_scraper_db_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)


def _skewed(spark):
    random.seed(11)
    # 'hot' carries 90% of rows; values repeat so distinct != count
    rows = [("hot", random.randint(0, 50)) for _ in range(900)]
    rows += [(f"k{i}", random.randint(0, 50)) for i in range(100)]
    return spark.createDataFrame(rows, "k string, v long")


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "k string, label string"
    )
    plain = big.join(small, "k").groupBy("k", "label").count()
    salted = salted_join(big, small, ["k"]).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("hot", "H")], "k string, label string")
    out = salted_join(big, small, ["k"], how="left")
    assert out.count() == big.count()
    assert out.filter(F.col("label").isNull()).count() == 100  # the k* rows


def test_salted_count_distinct_matches_exact(spark):
    df = _skewed(spark)
    exact = {
        r.k: r.dc
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("dc")).collect()
    }
    salted = {
        r.k: r.distinct_count
        for r in salted_count_distinct(df, ["k"], "v").collect()
    }
    assert salted == exact
