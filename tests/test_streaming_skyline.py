"""Streaming skyline (streaming/skyline.py): per-batch frontier folds
must equal the one-shot batch skyline, including the case where a late
batch DOMINATES points the stored frontier was keeping."""

from __future__ import annotations

import os

from youtube_scraper_db_spark.operators.skyline import pareto_frontier
from youtube_scraper_db_spark.streaming.skyline import run_skyline_stream

SCHEMA = "id long, price double, size long"


def _drain(spark, tmp_path, batches):
    staged = str(tmp_path / "staged")
    os.makedirs(staged, exist_ok=True)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(staged, f"batch_{i}.parquet")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged + "/*/")
    )
    return run_skyline_stream(
        stream, "price", "size", str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
    )


def _points(df):
    return sorted((r["price"], r["size"]) for r in df.collect())


def test_late_batch_dominates_stored_frontier(spark, tmp_path):
    """batch0's entire frontier is wiped by batch1's single better
    point — the fold case a frontier-append would get wrong."""
    batches = [
        [(0, 5.0, 10), (1, 6.0, 20)],
        [(2, 4.0, 25)],  # cheaper AND bigger than both
    ]
    final = _drain(spark, tmp_path, batches)
    assert _points(final) == [(4.0, 25)]


def test_stream_equals_batch_skyline_any_layout(spark, tmp_path):
    batches = [
        [(0, 9.0, 1), (1, 8.0, 3), (2, 7.0, 2)],
        [(3, 7.0, 2), (4, 6.5, 2)],   # replayed dupe + improvement
        [(5, 9.5, 9)],                # expensive but biggest — frontier
        [(6, 6.5, 2)],                # exact dupe of a frontier point
    ]
    final = _drain(spark, tmp_path, batches)
    all_rows = [r for b in batches for r in b]
    want = _points(
        pareto_frontier(
            final.sparkSession.createDataFrame(all_rows, SCHEMA),
            "price",
            "size",
        )
    )
    assert _points(final) == want
