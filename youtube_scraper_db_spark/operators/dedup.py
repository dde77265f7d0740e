"""Exact / first-seen deduplication (SURVEY.md §2.7 E2; LLM-pipeline exact
dedup). Approximate dedup (MinHash/SimHash/Jaccard/embedding) lives in
``llm.dedup``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, on: Sequence[str]) -> DataFrame:
    """Keep one arbitrary row per key — ``dropDuplicates`` (hash-groupBy;
    map-side partial dedup then one shuffle on the key)."""
    return df.dropDuplicates(list(on))


def dedup_first_seen(
    df: DataFrame,
    on: Sequence[str],
    order: Sequence[Column],
) -> DataFrame:
    """E2 with *defined* semantics: keep the first row per key under an
    explicit first-seen ordering (ref scrape_my_channel.py:389-395 preserves
    Python-dict insertion order; here the caller names the order so the
    result is deterministic and oracle-reproducible)."""
    w = Window.partitionBy(*on).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
