"""Streaming IVF index maintenance — the ANN member of the streaming
maintenance family (KMV folds the hash sample, Misra-Gries the count
summaries, LSH the band index, CC the labels, the skyline the frontier,
A-Res the reservoir; this folds the INVERTED LISTS): each micro-batch
of new embeddings is assigned to FROZEN coarse centroids and appended
to the stored lists — the embedding-store ingest loop at 100 TB, where
vectors arrive continuously and a retrain/rebuild per batch is not an
option.

Why the fold is exact: IVF assignment is a pure per-row argmax against
the frozen centroid set (llm/similarity.py assign_clusters), so
index(old ∪ new) = index(old) ∪ index(new) — the same per-row purity
that makes ``incremental_ivf_equiv``'s two-batch fold equal a full
rebuild, applied over a stream. Per-batch cost is ONE map-only
assignment pass over the batch (broadcast centroids, zero shuffle) plus
the batch-sized append; the historical corpus is never re-read or
re-assigned.

Restart/replay contract (foreachBatch is at-least-once): every batch
writes its assigned rows to its OWN ``b_{batch_id}`` subdirectory in
OVERWRITE mode (the streaming/dedup.py log-structured device), so a
crash-replayed batch rewrites the same deterministic rows instead of
appending duplicates; store presence is derived from the directories
on disk, so a rerun against the same checkpoint resumes against the
full prior index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..llm.similarity import ivf_index

_INDEX_SCHEMA = "vec_id long, v array<double>, vn double, cluster long"


def run_ivf_ingest_stream(
    emb_updates: DataFrame,
    centroids: DataFrame,
    index_root: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Drain ``emb_updates`` (``(id, embedding)`` micro-batches) into a
    log-structured IVF inverted-lists store under ``index_root``,
    assigning each batch against the FROZEN ``centroids`` ``(cid, cv)``.
    Returns the drained index read back from the store —
    ``(vec_id, v, vn, cluster)``, directly searchable by
    ``llm.similarity.ivf_search_index``."""
    spark = emb_updates.sparkSession
    os.makedirs(index_root, exist_ok=True)
    # freeze the centroid rows driver-side once: foreachBatch re-executes
    # its closure per batch, and a lazy centroid plan would re-read the
    # dim table every micro-batch
    cdf = centroids.localCheckpoint(eager=True)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        assigned = ivf_index(batch_df, cdf, id_col=id_col, vec_col=vec_col)
        assigned.write.mode("overwrite").parquet(
            os.path.join(index_root, f"b_{batch_id}")
        )

    q = (
        emb_updates.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dirs = sorted(
        os.path.join(index_root, d)
        for d in os.listdir(index_root)
        if d.startswith("b_")
    )
    if not dirs:
        return spark.createDataFrame([], _INDEX_SCHEMA)
    return spark.read.schema(_INDEX_SCHEMA).parquet(*dirs)


# ---------------------------------------------------------------------------
# Streaming NSW graph maintenance — the graph-ANN member of the family
# ---------------------------------------------------------------------------

_BUCKETED_SCHEMA = (
    "nid long, nv array<double>, nn double, ba long, bb long"
)
_DIRECTED_SCHEMA = "fam string, bk long, src long, dst long"


def run_nsw_ingest_stream(
    emb_updates: DataFrame,
    index_root: str,
    checkpoint: str,
    dim: int = 64,
    m_neighbors: int = 6,
    n_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Drain ``emb_updates`` into a CELL-KEYED NSW edge store: the
    directed edge table is a pure function of each (family, bucket)
    cell's membership (llm/graph_ann.py), so the store lays out one
    directory per cell and each micro-batch overwrites ONLY the cells
    it lands in — the graph twin of the log-structured LSH/IVF ingest,
    with replacement instead of append. Two state tables:

    - ``vectors/b_{batch_id}``: the batch's bucketed rows, append-only
      (bucketing is per-row pure — the IVF-store device). This is the
      membership source of truth the cell recomputes read.
    - ``edges/{fam}_{bk}``: the cell's current directed edges,
      overwritten whenever a batch lands in the cell. At 100 TB this is
      a dynamic partition overwrite on a (fam, bk)-partitioned table;
      cells are sized by the plane-count knob.

    Replay contract (foreachBatch is at-least-once): both writes are
    deterministic functions of (prior vectors ∪ batch), so a crash-
    replayed batch rewrites identical rows — a torn cell directory
    self-heals on the replay's overwrite. Per-batch cost: bucket the
    batch (map-only) + recompute ≤ 2·|batch| cells over their member
    rows — the historical corpus outside the touched cells is never
    read, matching the batch fold's O(touched) contract
    (``incremental_nsw_equiv``).

    Returns the drained DIRECTED table read back from the cell store;
    ``nsw_symmetrize`` makes it searchable."""
    from pyspark.sql import functions as F

    from ..llm.graph_ann import (
        N_PLANES,
        nsw_bucketed,
        nsw_directed_edges,
        nsw_touched_cells,
    )

    spark = emb_updates.sparkSession
    planes = n_planes if n_planes is not None else N_PLANES
    vec_dir = os.path.join(index_root, "vectors")
    edge_dir = os.path.join(index_root, "edges")
    for d in (vec_dir, edge_dir):
        os.makedirs(d, exist_ok=True)

    def _vector_dirs(exclude: int | None = None) -> list[str]:
        return sorted(
            os.path.join(vec_dir, d)
            for d in os.listdir(vec_dir)
            if d.startswith("b_") and (exclude is None or d != f"b_{exclude}")
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        bucketed_b = nsw_bucketed(
            batch_df, dim, planes, id_col, vec_col
        ).localCheckpoint(eager=True)
        touched = nsw_touched_cells(
            batch_df, dim, planes, id_col, vec_col
        ).localCheckpoint(eager=True)
        prior_dirs = _vector_dirs(exclude=batch_id)
        members = bucketed_b
        if prior_dirs:
            members = spark.read.schema(_BUCKETED_SCHEMA).parquet(
                *prior_dirs
            ).unionByName(bucketed_b)
        recomputed = nsw_directed_edges(members, m_neighbors, restrict=touched)
        # ONE dynamic-partition overwrite replaces exactly the touched
        # (fam, bk) partitions — deterministic rows, so a replayed batch
        # rewrites instead of corrupting; untouched partitions are never
        # rewritten (the first cut looped per-cell writes driver-side:
        # 32 cells × 4 batches = 128 job submissions, ~18 s of fixed
        # overhead at sf0.1 that one partitioned write eliminates)
        recomputed.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("fam", "bk").parquet(edge_dir)
        bucketed_b.write.mode("overwrite").parquet(
            os.path.join(vec_dir, f"b_{batch_id}")
        )

    q = (
        emb_updates.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not any(d.startswith("fam=") for d in os.listdir(edge_dir)):
        return spark.createDataFrame([], _DIRECTED_SCHEMA)
    # partition discovery restores fam/bk from the directory layout;
    # cast bk back to long (discovery infers int) and pin column order
    return (
        spark.read.parquet(edge_dir)
        .select(
            F.col("fam").cast("string").alias("fam"),
            F.col("bk").cast("long").alias("bk"),
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
    )
