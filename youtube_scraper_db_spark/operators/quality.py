"""Data-quality gate — declarative expectations evaluated in ONE pass.

A training-data pipeline promotes a batch only after checks pass
(nulls, key uniqueness, domains, ranges). The trap at scale is running
each check as its own job — k checks, k scans. Here every rule compiles
to a conditional-count expression inside a single aggregate, so the
whole report costs one scan + one scalar shuffle regardless of rule
count; uniqueness (not expressible as a row predicate) folds in as
count - count_distinct over the same pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_report(
    df: DataFrame,
    rules: dict[str, Column],
    unique_keys: list[str] | None = None,
) -> DataFrame:
    """One-row report: total rows plus, per rule, how many rows VIOLATE
    it (``rules`` map name → boolean Column that good rows satisfy).
    ``unique_keys`` adds a ``dup_<key>`` violation count per key column.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(F.when(~F.coalesce(pred, F.lit(False)), 1).otherwise(0)).alias(name)
        )
    for k in unique_keys or []:
        aggs.append(
            (F.count(k) - F.count_distinct(F.col(k))).alias(f"dup_{k}")
        )
    return df.agg(*aggs)
