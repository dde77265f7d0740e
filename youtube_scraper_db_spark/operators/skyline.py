"""Pareto frontier (skyline) — the classic OLAP dominance operator,
made scale-safe by bucket pruning + exact recheck.

A 2-D skyline (minimize one column, maximize the other) answered
naively is a quadratic NOT-EXISTS self-join — at 100 TB that's the
textbook disaster. The fix here is the same candidate-superset +
exact-recount shape as the Misra-Gries heavy hitters:

1. **Bucket prune** (one groupBy + one dim-sized window): floor the
   minimized column into B buckets with the same min-max floor
   normalization as the layout keys (monotone: a strictly smaller
   bucket implies a strictly smaller value). Per bucket take the max
   of the maximized column, then a running max over strictly-lower
   buckets (a B-row window). A row whose max-column is ≤ the running
   max of strictly-lower buckets is PROVABLY dominated (the witness
   has strictly smaller price and ≥ size) — discarded map-side after
   a broadcast of the B-row threshold table.
2. **Exact recheck** among the surviving candidates only: a tiny
   non-equi self-join applying the full dominance predicate. The
   survivors are a superset of the true frontier (pruning only ever
   removes dominated rows), so the result is EXACT.

Survivor count is bounded by B × (per-bucket rows that beat every
lower bucket) — in practice frontier-sized, orders of magnitude below
the input. The oracle replays the definition directly (NOT EXISTS),
so the gate checks the optimized plan against naive semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(
    df: DataFrame,
    minimize: str,
    maximize: str,
    buckets_bits: int = 6,
) -> DataFrame:
    """Rows of ``df`` not dominated by any other row, where domination
    means (≤ on ``minimize``) ∧ (≥ on ``maximize``) ∧ strict on at
    least one. NULL in either column excludes the row (NULLs neither
    dominate nor appear — the oracle's NOT EXISTS matches)."""
    top = (1 << buckets_bits) - 1
    d = df.where(F.col(minimize).isNotNull() & F.col(maximize).isNotNull())
    stats = d.agg(
        F.min(F.col(minimize).cast("double")).alias("mn"),
        F.max(F.col(minimize).cast("double")).alias("mx"),
    ).first()
    mn, mx = stats["mn"], stats["mx"]
    if mn is None:
        return d
    if mx <= mn:
        bucket = F.lit(0).cast("long")
    else:
        bucket = F.least(
            F.greatest(
                F.floor(
                    (F.col(minimize).cast("double") - F.lit(float(mn)))
                    / F.lit(float(mx - mn))
                    * F.lit(float(top))
                ),
                F.lit(0),
            ),
            F.lit(top),
        )
    b = d.withColumn("__b", bucket)
    per_bucket = b.groupBy("__b").agg(F.max(maximize).alias("__bmax"))
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    thresholds = per_bucket.select(
        "__b", F.max("__bmax").over(w).alias("__lower_max")
    )
    cand = (
        b.join(F.broadcast(thresholds), "__b")
        .where(
            F.col("__lower_max").isNull()
            | (F.col(maximize) > F.col("__lower_max"))
        )
        .drop("__b", "__lower_max")
    )
    # exact dominance among survivors (frontier-superset² non-equi join)
    lhs = cand.alias("p")
    rhs = cand.select(
        F.col(minimize).alias("__q_min"), F.col(maximize).alias("__q_max")
    ).alias("q")
    dominated = (
        (F.col("__q_min") <= F.col(f"p.{minimize}"))
        & (F.col("__q_max") >= F.col(f"p.{maximize}"))
        & (
            (F.col("__q_min") < F.col(f"p.{minimize}"))
            | (F.col("__q_max") > F.col(f"p.{maximize}"))
        )
    )
    return lhs.join(F.broadcast(rhs), dominated, "left_anti")


def pareto_oracle_sql(
    table: str, keys: str, minimize: str, maximize: str
) -> str:
    """Replay by definition: NOT EXISTS a dominating row."""
    return f"""
    SELECT {keys} FROM {table} p
    WHERE p.{minimize} IS NOT NULL AND p.{maximize} IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM {table} q
        WHERE q.{minimize} IS NOT NULL AND q.{maximize} IS NOT NULL
          AND q.{minimize} <= p.{minimize} AND q.{maximize} >= p.{maximize}
          AND (q.{minimize} < p.{minimize} OR q.{maximize} > p.{maximize})
      )
    """


def pareto_frontier_grouped(
    df: DataFrame,
    group_col: str,
    minimize: str,
    maximize: str,
    buckets_bits: int = 6,
) -> DataFrame:
    """Per-group Pareto frontier — dominance evaluated WITHIN each
    group (the "best per brand / per source" skyline). Same
    candidate-superset + exact-recheck shape as the global operator:
    the bucket floor uses the GLOBAL min-max of ``minimize`` (monotone
    within every group, so per-group pruning stays sound), thresholds
    become a (groups × B)-row running max partitioned by group, and the
    exact recheck joins candidates against candidates OF THE SAME GROUP
    only. NULL in the group or either measure excludes the row."""
    top = (1 << buckets_bits) - 1
    d = df.where(
        F.col(group_col).isNotNull()
        & F.col(minimize).isNotNull()
        & F.col(maximize).isNotNull()
    )
    stats = d.agg(
        F.min(F.col(minimize).cast("double")).alias("mn"),
        F.max(F.col(minimize).cast("double")).alias("mx"),
    ).first()
    mn, mx = stats["mn"], stats["mx"]
    if mn is None:
        return d
    if mx <= mn:
        bucket = F.lit(0).cast("long")
    else:
        bucket = F.least(
            F.greatest(
                F.floor(
                    (F.col(minimize).cast("double") - F.lit(float(mn)))
                    / F.lit(float(mx - mn))
                    * F.lit(float(top))
                ),
                F.lit(0),
            ),
            F.lit(top),
        )
    b = d.withColumn("__b", bucket)
    per_bucket = b.groupBy(group_col, "__b").agg(
        F.max(maximize).alias("__bmax")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    thresholds = per_bucket.select(
        group_col, "__b", F.max("__bmax").over(w).alias("__lower_max")
    )
    cand = (
        b.join(F.broadcast(thresholds), [group_col, "__b"])
        .where(
            F.col("__lower_max").isNull()
            | (F.col(maximize) > F.col("__lower_max"))
        )
        .drop("__b", "__lower_max")
    )
    lhs = cand.alias("p")
    rhs = cand.select(
        F.col(group_col).alias("__q_g"),
        F.col(minimize).alias("__q_min"),
        F.col(maximize).alias("__q_max"),
    ).alias("q")
    dominated = (
        (F.col("__q_g") == F.col(f"p.{group_col}"))
        & (F.col("__q_min") <= F.col(f"p.{minimize}"))
        & (F.col("__q_max") >= F.col(f"p.{maximize}"))
        & (
            (F.col("__q_min") < F.col(f"p.{minimize}"))
            | (F.col("__q_max") > F.col(f"p.{maximize}"))
        )
    )
    return lhs.join(F.broadcast(rhs), dominated, "left_anti")


def pareto_grouped_oracle_sql(
    table: str, group_col: str, keys: str, minimize: str, maximize: str
) -> str:
    """Replay by definition: NOT EXISTS a dominating row IN THE SAME
    group."""
    return f"""
    SELECT {keys} FROM {table} p
    WHERE p.{group_col} IS NOT NULL
      AND p.{minimize} IS NOT NULL AND p.{maximize} IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM {table} q
        WHERE q.{group_col} = p.{group_col}
          AND q.{minimize} IS NOT NULL AND q.{maximize} IS NOT NULL
          AND q.{minimize} <= p.{minimize} AND q.{maximize} >= p.{maximize}
          AND (q.{minimize} < p.{minimize} OR q.{maximize} > p.{maximize})
      )
    """
