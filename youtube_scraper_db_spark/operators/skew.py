"""Skew mitigation for hot keys (SURVEY.md §7.2 step 10 scale extensions).

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these helpers cover the two cases it can't: a skewed join where the
small side must be replicated BEFORE the shuffle (e.g. under a required
output partitioning), and skewed distinct-count aggregation, where one
hot group funnels every distinct value through a single reducer.

Both are semantically transparent: results equal the unsalted form (tests
assert equality); only the shuffle layout changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where ``big`` has heavy-hitter keys: each big row gets a
    deterministic pseudo-random salt in [0, B); the small side is
    replicated B times with every salt value. The shuffle key becomes
    (keys…, salt) so one hot key spreads over B reducers.

    Salt is derived from a hash of the whole big row (not ``rand()``) so
    retried tasks salt identically — required for exactly-once semantics
    under task retry. Cost: small side × B; use for genuinely hot keys,
    not as a default (AQE already splits moderate skew).

    Only big-side-preserving join types are accepted: replicating the
    small side B times would emit B copies of every unmatched small-side
    row under ``right``/``full`` outer joins — silently wrong results."""
    safe = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
            "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated small "
            f"side would duplicate unmatched rows; use one of {sorted(safe)}"
        )
    salt_big = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)
    ).cast("int")
    b = big.withColumn("__salt", salt_big)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = b.join(s, [*keys, "__salt"], how)
    return out.drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """``groupBy(g).agg(countDistinct(v))`` for skewed groups, in two
    stages: salt = hash(value) % B partitions each group's VALUE SPACE
    disjointly, so per-(group, salt) distinct counts sum exactly to the
    group's distinct count. The hot group's work spreads over B reducers
    in stage 1; stage 2 aggregates B small rows per group.

    Output column: ``distinct_count``."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    partial = (
        df.select(*group_cols, F.col(value_col), salt.alias("__salt"))
        .groupBy(*group_cols, "__salt")
        .agg(F.countDistinct(value_col).alias("__partial"))
    )
    return (
        partial.groupBy(*group_cols)
        .agg(F.sum("__partial").cast("long").alias("distinct_count"))
    )
