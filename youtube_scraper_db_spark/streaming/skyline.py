"""Streaming Pareto-frontier maintenance — the skyline folded per
micro-batch via ``foreachBatch`` + the batch operator
(operators/skyline.py), joining the streaming maintenance family
(sketches fold registers/counters/bits/samples, Misra-Gries folds
summaries, CC folds connectivity, the LSH store folds bands; this
folds DOMINANCE).

Exactness of the fold: frontier(A ∪ B) = frontier(frontier(A) ∪ B).
⊆ — a point of frontier(A∪B) lies in A or B; if in A it is undominated
in A, hence in frontier(A), so it is IN the fold's input and still
undominated there (the fold input is a subset of A∪B). ⊇ — a fold
survivor dominated by some q ∈ A∪B is impossible: if q ∈ frontier(A)∪B
it would have eliminated the survivor inside the fold; otherwise
q ∈ A∖frontier(A) is itself dominated by some q′ ∈ frontier(A), and
dominance is transitive, so q′ eliminates the survivor — contradiction.
So the stored frontier is all the state a fold ever needs: each batch
costs pareto_frontier(frontier ∪ batch) — frontier-plus-batch-bounded,
never a re-read of history. Replaying a batch is idempotent (its
points are already dominated-or-present).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.skyline import pareto_frontier


def run_skyline_stream(
    updates: DataFrame,
    minimize: str,
    maximize: str,
    table_root: str,
    checkpoint: str,
) -> DataFrame:
    """Drain ``updates`` into a versioned frontier table, folding each
    micro-batch through the batch skyline operator. Returns the final
    frontier as a batch DataFrame. Version pointer RESUMES from the
    highest ``v{n}`` on disk (the streaming/cc.py restart contract)."""
    spark = updates.sparkSession
    os.makedirs(table_root, exist_ok=True)
    existing = [
        int(d[1:])
        for d in os.listdir(table_root)
        if d.startswith("v") and d[1:].isdigit()
    ]
    current = {"v": max(existing, default=0)}
    schema = updates.schema

    def _frontier() -> DataFrame:
        if current["v"] == 0:
            return spark.createDataFrame([], schema)
        return spark.read.parquet(
            os.path.join(table_root, f"v{current['v']}")
        )

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        folded = pareto_frontier(
            _frontier().unionByName(batch_df), minimize, maximize
        )
        nxt = current["v"] + 1
        folded.write.mode("overwrite").parquet(
            os.path.join(table_root, f"v{nxt}")
        )
        current["v"] = nxt

    q = (
        updates.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _frontier()
