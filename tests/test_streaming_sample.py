"""Streaming weighted sample (streaming/sample.py): per-batch A-Res
folds must equal the one-shot batch sample for any micro-batch layout,
survive restarts by resuming the COMMITTED version pointer, and ignore
partial (crash-torn) version directories."""

from __future__ import annotations

import os

from youtube_scraper_db_spark.llm.sampling import (
    weighted_sample,
    weighted_sample_grouped,
)
from youtube_scraper_db_spark.streaming.sample import (
    run_weighted_sample_stream,
)
from youtube_scraper_db_spark.streaming.versioned import (
    latest_committed_version,
)

N = 8


def _stage(spark, tmp_path, batches):
    staged = str(tmp_path / "staged")
    os.makedirs(staged, exist_ok=True)
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "id long, w double, src string"
        ).coalesce(1).write.parquet(os.path.join(staged, f"b_{i}.parquet"))
    return staged


def _stream(spark, staged):
    return (
        spark.readStream.schema("id long, w double, src string")
        .option("maxFilesPerTrigger", "1")
        .parquet(staged + "/*/")
    )


def _rows(df):
    return sorted((r["id"], r["priority"]) for r in df.collect())


BATCHES = [
    [(i, float(i % 7 + 1), "a" if i % 2 else "b") for i in range(0, 30)],
    [(i, float(i % 5 + 1), "a" if i % 2 else "b") for i in range(30, 55)],
    [(i, 0.0, "a") for i in range(55, 60)],  # zero weights: priority 0
    [(i, float(i), "b") for i in range(60, 70)],
]
ALL = [r for b in BATCHES for r in b]


def test_drained_equals_batch_sample(spark, tmp_path):
    staged = _stage(spark, tmp_path, BATCHES)
    drained = run_weighted_sample_stream(
        _stream(spark, staged), "id", "w", N,
        str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
    )
    direct = weighted_sample(
        spark.createDataFrame(ALL, "id long, w double, src string"),
        "id", "w", N,
    )
    assert _rows(drained) == _rows(direct)


def test_grouped_reservoir_per_stratum(spark, tmp_path):
    staged = _stage(spark, tmp_path, BATCHES)
    drained = run_weighted_sample_stream(
        _stream(spark, staged), "id", "w", N,
        str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        group_col="src",
    )
    direct = weighted_sample_grouped(
        spark.createDataFrame(ALL, "id long, w double, src string"),
        "src", "id", "w", N,
    )
    assert _rows(drained) == _rows(direct)


def test_restart_resumes_committed_version(spark, tmp_path):
    # drain the first two batches, then "restart" with the rest staged
    staged = _stage(spark, tmp_path, BATCHES[:2])
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    run_weighted_sample_stream(_stream(spark, staged), "id", "w", N, tbl, ckpt)
    v_after_first = latest_committed_version(tbl)
    assert v_after_first >= 1
    for i, rows in enumerate(BATCHES[2:], start=2):
        spark.createDataFrame(
            rows, "id long, w double, src string"
        ).coalesce(1).write.parquet(os.path.join(staged, f"b_{i}.parquet"))
    drained = run_weighted_sample_stream(
        _stream(spark, staged), "id", "w", N, tbl, ckpt
    )
    direct = weighted_sample(
        spark.createDataFrame(ALL, "id long, w double, src string"),
        "id", "w", N,
    )
    assert _rows(drained) == _rows(direct)


def test_partial_version_dir_is_skipped_and_healed(spark, tmp_path):
    staged = _stage(spark, tmp_path, BATCHES[:2])
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    run_weighted_sample_stream(_stream(spark, staged), "id", "w", N, tbl, ckpt)
    committed = latest_committed_version(tbl)
    # simulate a crash mid-write: a higher version dir with no _SUCCESS
    torn = os.path.join(tbl, f"v{committed + 1}")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as fh:
        fh.write(b"torn")
    assert latest_committed_version(tbl) == committed
    # next drain must fold from the committed state and OVERWRITE the
    # torn dir rather than adopting it
    for i, rows in enumerate(BATCHES[2:], start=2):
        spark.createDataFrame(
            rows, "id long, w double, src string"
        ).coalesce(1).write.parquet(os.path.join(staged, f"b_{i}.parquet"))
    drained = run_weighted_sample_stream(
        _stream(spark, staged), "id", "w", N, tbl, ckpt
    )
    direct = weighted_sample(
        spark.createDataFrame(ALL, "id long, w double, src string"),
        "id", "w", N,
    )
    assert _rows(drained) == _rows(direct)
    assert os.path.exists(os.path.join(torn, "_SUCCESS"))
