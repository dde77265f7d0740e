"""Transcript file source (S9, E3; ref add_transcripts.py:65-132, 217-221;
README.md:104-120).

File format: optional header lines ``TITLE:``, ``URL:``, ``ID:``, a blank
line, then the free transcript body (optionally ``[MM:SS]``-timestamped).
One file = one record, so the scan is ``wholetext`` — each file becomes a
row and the parse is pure Column expressions, shared verbatim by the batch
reader here and the streaming inbox (streaming/inbox.py). At scale this is
an embarrassingly parallel file scan; no shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import extract_video_id, has_timestamps

#: glob set unioned by the reference inbox (ref add_transcripts.py:218-221).
DEFAULT_GLOBS = ("*.txt", "*.srt", "*.vtt")


def _header(text, name: str):
    """Value of the first ``NAME:`` header line, trimmed; NULL if absent."""
    return F.nullif(
        F.trim(F.regexp_extract(text, rf"(?m)^{name}:(.*)$", 1)), F.lit("")
    )


def parse_transcript_text(df: DataFrame, text_col: str, file_col: str) -> DataFrame:
    """Parse whole-file text into transcript records.

    Semantics per ref add_transcripts.py:78-121: ``video_id`` prefers the
    URL-derived id over the ``ID:`` line; missing title falls back to
    ``"Video <id>"``; missing url is synthesized from the id; the body is
    everything after the first blank line FOLLOWING a header line (the
    reference only breaks on a blank line once metadata was seen, so a
    leading blank line before the headers does not start the body), or
    the WHOLE file when no such blank line exists (the reference's
    ``transcript_start_line`` stays 0 — headers included in the body);
    records with no id or an empty body are dropped (the reference
    logs-and-skips them).
    """
    text = F.col(text_col)
    url_hdr = _header(text, "URL")
    vid = F.coalesce(extract_video_id(url_hdr), _header(text, "ID"))
    # First blank line after the first header line; anchored so that blank
    # lines BEFORE any header don't terminate the (empty) metadata block.
    body_re = r"(?s)(?:^|\r?\n)(?:TITLE|URL|ID):.*?\r?\n[ \t]*\r?\n(.*)$"
    body = F.when(
        text.rlike(body_re), F.regexp_extract(text, body_re, 1)
    ).otherwise(text)
    return (
        df.select(
            F.col(file_col).alias("source_file"),
            vid.alias("video_id"),
            F.coalesce(
                _header(text, "TITLE"), F.concat(F.lit("Video "), vid)
            ).alias("title"),
            F.coalesce(
                url_hdr,
                F.concat(F.lit("https://www.youtube.com/watch?v="), vid),
            ).alias("url"),
            body.alias("transcript"),
            has_timestamps(body).alias("has_timestamps"),
        )
        .filter(F.col("video_id").isNotNull() & (F.trim("transcript") != ""))
    )


def read_transcript_files(
    spark: SparkSession, inbox_dir: str, globs: tuple[str, ...] = DEFAULT_GLOBS
) -> DataFrame:
    """Batch read of an inbox directory: one scan with a brace-alternation
    ``pathGlobFilter`` covering the extension set (E3) → parsed records —
    tolerant of extensions with zero matches, unlike per-glob path lists.
    ``_metadata.file_path`` (not the deprecated ``input_file_name``)
    carries provenance and works identically under Structured Streaming."""
    pattern = "*.{" + ",".join(g.removeprefix("*.") for g in globs) + "}"
    raw = (
        spark.read.option("pathGlobFilter", pattern)
        .text(inbox_dir, wholetext=True)
        .select("value", F.col("_metadata.file_path").alias("file_path"))
    )
    return parse_transcript_text(raw, "value", "file_path")
