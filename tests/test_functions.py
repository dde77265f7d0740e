"""Scalar function semantics (SURVEY.md §2.8) — reference-parity cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_scraper_db_spark.functions import scalars


def _vals(spark, col, data, dtype="long"):
    df = spark.createDataFrame([(v,) for v in data], f"x {dtype}")
    return [r[0] for r in df.select(col(F.col("x")).alias("y")).collect()]


def test_format_duration_branches(spark):
    # ref display.py:195-207: h/m/s segments, Unknown for NULL
    out = _vals(spark, scalars.format_duration, [3723, 120, 45, 0, None])
    assert out == ["1h 2m 3s", "2m 0s", "45s", "0s", "Unknown"]


def test_extract_video_id_variants(spark):
    urls = [
        "https://www.youtube.com/watch?v=abcdefghijk&t=1",
        "https://youtu.be/ABCDEFGHIJK",
        "https://www.youtube.com/embed/a1b2c3d4e5f",
        "xyzXYZ01234",
        "https://example.com/nothing",
        None,
    ]
    out = _vals(spark, scalars.extract_video_id, urls, dtype="string")
    assert out == ["abcdefghijk", "ABCDEFGHIJK", "a1b2c3d4e5f", "xyzXYZ01234", None, None]
    # python twin agrees
    assert [scalars.python_extract_video_id(u) for u in urls] == out


def test_has_timestamps_patterns(spark):
    # ref add_transcripts.py:49-63: [MM:SS], MM:SS -, line-start MM:SS, <MM:SS>
    texts = [
        "[00:15] hello",
        "12:30 - intro",
        "1:05 start of line",
        "a <2:03> b",
        "no timestamps here 100 200",
    ]
    out = _vals(spark, scalars.has_timestamps, texts, dtype="string")
    assert out == [True, True, True, True, False]


def test_sanitize_filename(spark):
    out = _vals(
        spark,
        scalars.sanitize_filename,
        ['bad/name:with*chars?', "x" * 150, "", "   "],
        dtype="string",
    )
    assert out[0] == "bad_name_with_chars_"
    assert len(out[1]) == 100
    assert out[2] == "untitled"
    assert out[3] == "untitled"


def test_snippet_and_highlight(spark):
    text = ("a" * 150) + "NEEDLE" + ("b" * 150)
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        scalars.context_snippet("t", "needle", radius=10).alias("s"),
        scalars.highlight(F.col("t"), "NEEDLE").alias("h"),
    ).collect()[0]
    # ±10 chars around the case-insensitive match
    assert row.s == ("a" * 10) + "NEEDLE" + ("b" * 10)
    assert "**NEEDLE**" in row.h


def test_yyyymmdd_and_iso(spark):
    df = spark.createDataFrame([("20240131",)], "x string")
    assert str(df.select(scalars.yyyymmdd_to_date("x").alias("d")).collect()[0].d) == "2024-01-31"
    df2 = spark.createDataFrame([("2024-01-31T12:34:56+00:00",), ("garbage",)], "x string")
    out = [r.t for r in df2.select(scalars.iso_parse("x").alias("t")).collect()]
    assert out[0] is not None and out[1] is None  # malformed → NULL, not error


def test_format_thousands(spark):
    out = _vals(spark, scalars.format_thousands, [1234567])
    assert out == ["1,234,567"]
