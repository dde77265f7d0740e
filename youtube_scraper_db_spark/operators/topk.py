"""Top-k operators (SURVEY.md §2.6 O2/O3/O7).

Ordered ``LIMIT k`` compiles to Spark's ``TakeOrderedAndProject`` — a
per-partition partial top-k followed by a k-row merge on the driver, never
a global sort. That property is what makes the reference's ``LIMIT 100``
search caps (ref display.py:556,592) safe at 100 TB. Callers must provide a
total order (tie-break on a unique key) or the result set is
nondeterministic across runs/engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Globally ordered LIMIT k (O7). ``order`` should end with a unique
    tie-break column for determinism."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k within each group via ``row_number`` over a window — the
    standard Spark pattern; one shuffle on the group key."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
