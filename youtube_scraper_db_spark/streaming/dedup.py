"""Streaming deduplication — exactly-once-per-key ingestion with bounded
state.

An ingestion stream (re-scraped playlists, re-delivered transcript
files, at-least-once upstream queues) re-emits the same logical row; the
sink must see it once. On a stream, plain ``dropDuplicates`` keeps every
key ever seen in state — unbounded growth, the streaming scale-killer.
``dropDuplicatesWithinWatermark`` instead evicts key state once the
event-time watermark passes it: duplicates are only ever re-delivered
within some bounded lateness in practice, so state is
O(keys per watermark horizon), independent of stream lifetime.

Batch twin: the identical call site degrades to ``dropDuplicates`` —
same semantics when the whole input is one "batch epoch" — preserving
the backfill-IS-the-streaming-query property of streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per key; on streams, forget keys once the
    watermark guarantees no more duplicates can arrive for them."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return df.dropDuplicates(key_cols)


def run_lsh_ingest_stream(
    doc_updates: DataFrame,
    index_root: str,
    checkpoint: str,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    portable: bool = False,
):
    """Online NEAR-dup detection at ingest — the dedup-before-store loop
    of a 100 TB corpus: each micro-batch of ``(doc, text)`` rows signs
    and bands ONLY ITSELF (llm/dedup.py minhash_signatures /
    minhash_band_table), probes its band rows against the STORED index
    to flag near-dups of anything already ingested, finds within-batch
    pairs, then APPENDS its signature and band rows to the store — the
    log-structured fold (banding is per-doc, so index(old ∪ new) =
    index(old) ∪ index(new); no rewrite, no re-shingling of history).

    Exactly-once discovery: a candidate pair (same band bucket,
    doc_a < doc_b) surfaces EITHER inside the batch that carries both
    docs (the within-batch self-join) OR when the later doc's batch
    probes the store — never both, because a doc enters the store only
    after its batch's probe. The drained pair set therefore equals the
    one-shot ``minhash_lsh_pairs`` of the full corpus for ANY
    micro-batch layout (``stream_lsh_ingest_dups`` gates the equality).

    Per-batch cost is batch-sized: one keyed join of the batch's band
    rows against the stored band table plus a batch self-join — the
    historical corpus is never re-scanned. Returns (pairs, sigs, bands)
    as batch DataFrames read back from the store."""
    import os

    from pyspark.sql import functions as F

    from ..llm.dedup import (
        lsh_pairs_from_index,
        minhash_band_table,
        minhash_signatures,
    )

    spark = doc_updates.sparkSession
    sig_dir = os.path.join(index_root, "sigs")
    band_dir = os.path.join(index_root, "bands")
    pair_dir = os.path.join(index_root, "pairs")
    state = {"has_store": False, "has_pairs": False}
    sig_schema = "doc long, sig array<bigint>"
    band_schema = "doc long, band int, bucket long"
    pair_schema = "doc_a long, doc_b long, est_jaccard double"

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        sig_b = minhash_signatures(
            batch_df, "doc", "text", num_hashes, k, portable=portable
        ).localCheckpoint(eager=True)
        bands_b = minhash_band_table(
            sig_b, num_hashes, bands, portable=portable
        ).localCheckpoint(eager=True)
        within = lsh_pairs_from_index(bands_b, sig_b, num_hashes)
        if state["has_store"]:
            store_bands = spark.read.schema(band_schema).parquet(band_dir)
            store_sigs = spark.read.schema(sig_schema).parquet(sig_dir)
            a = bands_b.alias("a")
            s = store_bands.alias("s")
            # store doc ids and batch doc ids are disjoint (ingest
            # invariant: a doc is appended exactly once), so canonical
            # (min, max) ordering is safe
            cand = (
                a.join(
                    s,
                    (F.col("a.band") == F.col("s.band"))
                    & (F.col("a.bucket") == F.col("s.bucket")),
                )
                .select(
                    F.least(F.col("a.doc"), F.col("s.doc")).alias("doc_a"),
                    F.greatest(F.col("a.doc"), F.col("s.doc")).alias("doc_b"),
                )
                .dropDuplicates(["doc_a", "doc_b"])
            )
            all_sigs = store_sigs.unionByName(sig_b)
            sa = all_sigs.select(
                F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a")
            )
            sb = all_sigs.select(
                F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b")
            )
            agree = F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda v: v,
                )
            )
            cross = (
                cand.join(sa, "doc_a")
                .join(sb, "doc_b")
                .select(
                    "doc_a",
                    "doc_b",
                    F.round(agree / F.lit(float(num_hashes)), 4).alias(
                        "est_jaccard"
                    ),
                )
            )
            new_pairs = within.unionByName(cross)
        else:
            new_pairs = within
        new_pairs.write.mode("append").parquet(pair_dir)
        state["has_pairs"] = True
        # append AFTER probing: the batch must not see itself in the store
        sig_b.write.mode("append").parquet(sig_dir)
        bands_b.write.mode("append").parquet(band_dir)
        state["has_store"] = True

    q = (
        doc_updates.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    empty_pairs = spark.createDataFrame([], pair_schema)
    return (
        spark.read.schema(pair_schema).parquet(pair_dir)
        if state["has_pairs"]
        else empty_pairs,
        spark.read.schema(sig_schema).parquet(sig_dir)
        if state["has_store"]
        else spark.createDataFrame([], sig_schema),
        spark.read.schema(band_schema).parquet(band_dir)
        if state["has_store"]
        else spark.createDataFrame([], band_schema),
    )
