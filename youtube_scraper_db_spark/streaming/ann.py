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
