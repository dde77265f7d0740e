"""Rendered transcript text export (S15, F7; ref export_transcript.py:64-89,
export_playlist_transcripts.py:84-117).

Render is a pure Column expression (header lines + body via concat_ws);
the write fans out one file per video through ``foreachPartition`` so no
transcript ever crosses the driver. Filenames reuse the sanitize rule (F7)
with the video id appended for uniqueness.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import sanitize_filename


def render_transcript_files(videos_with_transcripts: DataFrame) -> DataFrame:
    """``(filename, content)`` per video, matching the reference's layout:
    ``TITLE:``/``URL:`` headers, a generated-by comment, blank line, body
    (ref export_transcript.py:70-78)."""
    df = videos_with_transcripts
    content = F.concat_ws(
        "\n",
        F.concat(F.lit("TITLE: "), F.coalesce("title", F.lit(""))),
        F.concat(
            F.lit("URL: "),
            F.coalesce(
                "video_url",
                F.concat(F.lit("https://www.youtube.com/watch?v="), F.col("video_id")),
            ),
        ),
        F.lit("# Transcript exported from the archive"),
        F.lit(""),
        F.coalesce("transcript", F.lit("")),
    )
    fname = F.concat(
        sanitize_filename("title"), F.lit("_"), F.col("video_id"), F.lit(".txt")
    )
    return df.select(fname.alias("filename"), content.alias("content"))


def write_transcript_files(videos_with_transcripts: DataFrame, out_dir: str) -> int:
    """Materialize one text file per video under ``out_dir``; returns the
    file count. Executor-side writes (foreachPartition) — the driver only
    sees the count."""
    os.makedirs(out_dir, exist_ok=True)
    rendered = render_transcript_files(videos_with_transcripts)

    def write_partition(rows) -> None:
        for row in rows:
            with open(os.path.join(out_dir, row.filename), "w", encoding="utf-8") as f:
                f.write(row.content)

    rendered.foreachPartition(write_partition)
    return len(os.listdir(out_dir))
