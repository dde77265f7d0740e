"""Incremental aggregate maintenance — keep a day-level rollup current
by folding in new event batches, never rescanning history.

At 100 TB you cannot recompute a dashboard rollup from the raw events on
every refresh; the standing pattern is a materialized aggregate that
each ingest batch UPDATES. For distributive aggregates (count/sum/min/
max) the update is exact algebra: aggregate the batch alone, then merge
partial states with the stored rollup. avg is carried as (sum, count)
and derived at read time — the classic partial-aggregate decomposition,
the same trick Spark's own map-side combine uses, applied across
batches.

Cost per refresh: one scan of the BATCH (not history) + a shuffle of
``batch_days × types`` rows merged against a rollup of similar size.
The rollup itself stays tiny relative to the fact table, so the merge
groupBy is noise; at cluster scale store it bucketed by day
(operators/bucketing.py) and even that shuffle disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEYS = ["day", "event_type"]

_STATE = ["n_events", "sum_value", "min_value", "max_value"]


def rollup_batch(events: DataFrame) -> DataFrame:
    """Aggregate one batch of raw events to mergeable day-level state.

    ``uniq_users_sketch`` is the HLL binary state (Apache DataSketches
    via ``hll_sketch_agg``), NOT a count: distinct counts don't sum
    across batches, but their sketches union losslessly — the only way
    an incremental rollup can answer "distinct users per day" without
    re-reading history. ~KB per group, merge is a bitwise max."""
    return (
        events.select(
            F.col("ts").cast("date").alias("day"),
            "event_type",
            "value",
            "user_id",
        )
        .groupBy(*KEYS)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.hll_sketch_agg("user_id").alias("uniq_users_sketch"),
        )
    )


def merge_rollup(current: DataFrame | None, batch_state: DataFrame) -> DataFrame:
    """Fold a batch's partial state into the stored rollup.

    union + re-aggregate with the state-merge functions (sum of counts,
    sum of sums, min of mins, max of maxes, HLL union of sketches) —
    associative/commutative, so refresh order and batch boundaries
    cannot change the result."""
    both = batch_state if current is None else current.unionByName(batch_state)
    return both.groupBy(*KEYS).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.hll_union_agg("uniq_users_sketch").alias("uniq_users_sketch"),
    )


def refresh_rollup(current: DataFrame | None, new_events: DataFrame) -> DataFrame:
    """One maintenance step: rollup ← rollup ⊕ agg(batch)."""
    return merge_rollup(current, rollup_batch(new_events))


def read_rollup(rollup: DataFrame) -> DataFrame:
    """User-facing view: derive non-distributive columns (avg) from the
    carried state at read time."""
    return rollup.select(
        *KEYS,
        "n_events",
        "sum_value",
        "min_value",
        "max_value",
        (F.col("sum_value") / F.col("n_events")).alias("avg_value"),
        F.hll_sketch_estimate("uniq_users_sketch").alias("approx_uniq_users"),
    )
