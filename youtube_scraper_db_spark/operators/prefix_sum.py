"""Distributed cumulative sum — the scale-safe replacement for
``SUM(x) OVER (ORDER BY k)``.

A global ordered window collapses the whole dataset into ONE reducer
(Spark plans ``Exchange SinglePartition`` + a single sorted partition) —
the canonical scale-killer for running totals, interval sweeps, and
cumulative distributions. The classic two-phase formulation instead:

1. ``repartitionByRange`` on the sort key — a range shuffle, every
   partition holds a contiguous key interval;
2. running sum WITHIN each partition (``Window.partitionBy(pid)`` — no
   cross-partition ordering, so no single-reducer exchange);
3. per-partition totals (one row per partition — thousands of rows at
   most) aggregated on the driver into exclusive prefix offsets, joined
   back as a broadcast.

Total cost: one range shuffle of the data + one broadcast of
#partitions rows, with every stage at full parallelism. The sweep-line
queries built on this (interval stabbing counts, cumulative revenue)
inherit the same scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` in ``order_col``
    order, without a single-partition exchange.

    ``order_col`` must be unique per row (a total order) — pre-aggregate
    to one row per key first; with duplicate keys split across a range
    boundary the within-key ordering would be partition-dependent."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Materialize the (pre-aggregated, one-row-per-key) input ONCE: three
    # downstream jobs read it (range-boundary sampling, partition totals,
    # final join) and would otherwise each recompute the full upstream
    # lineage. localCheckpoint also pins the frame the range shuffle
    # samples from, so partition ids are identical across those jobs.
    # Storage is auto-released by the ContextCleaner when the RDD is GC'd.
    df = df.localCheckpoint(eager=True)
    rp = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = rp.withColumn("_local", F.sum(value_col).over(w))
    # One row per partition: (pid, partition total). Driver-side exclusive
    # prefix — O(#partitions), the only non-distributed step, by design.
    totals = sorted(
        (r["_pid"], r["_tot"])
        for r in local.groupBy("_pid").agg(F.sum(value_col).alias("_tot")).collect()
    )
    offsets, acc = [], 0
    for pid, tot in totals:
        offsets.append((pid, acc))
        acc += tot or 0
    if not offsets:  # empty input: nothing to offset
        return local.withColumn(out_col, F.col("_local")).drop("_pid", "_local")
    off_df = df.sparkSession.createDataFrame(offsets, ["_pid", "_offset"])
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_offset"))
        .drop("_pid", "_local", "_offset")
    )
