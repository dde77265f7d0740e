"""Search queries (SURVEY.md §3.3 Search page; P4-P6, J4, J5, F5, F6, O7).

Case-insensitive substring search with context snippets and highlighting.
At 100 TB the LIKE scan is the bottleneck: the filter is a single
codegen'd `Contains` over the scan (no shuffle), the top-k cap bounds the
result, and column pruning keeps the scan to the searched columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import context_snippet, highlight
from ..semantics import ci_contains, desc_nulls_last, first_deterministic


def search_titles(
    videos: DataFrame,
    playlist_videos: DataFrame,
    playlists: DataFrame,
    query: str,
    limit: int = 100,
) -> DataFrame:
    """J4/P4/O3/O7 (ref display.py:547-559): case-insensitive title search
    with playlist attribution. The reference's bare-column GROUP BY picks an
    arbitrary playlist title (SURVEY §2.11); we define it as MIN(title)."""
    return (
        videos.filter(ci_contains("title", query))
        .join(playlist_videos, "video_id", "left")
        .join(
            playlists.select("playlist_id", F.col("title").alias("playlist_title")),
            "playlist_id",
            "left",
        )
        .groupBy("video_id", "title", "publish_date", "author")
        .agg(first_deterministic("playlist_title").alias("playlist_title"))
        .orderBy(desc_nulls_last("publish_date"), F.col("video_id"))
        .limit(limit)
    )


def search_transcripts(
    transcripts: DataFrame,
    videos: DataFrame,
    query: str,
    limit: int = 50,
    snippet_radius: int = 100,
) -> DataFrame:
    """J5/P5/F5/F6/O7 (ref display.py:585-595, 604-620): case-insensitive
    full-text search over transcript bodies joined to video metadata, with
    a ±radius context snippet and exact-case highlight."""
    return (
        transcripts.filter(ci_contains("transcript", query))
        .join(videos.select("video_id", "title", "publish_date", "author"), "video_id", "inner")
        .withColumn("snippet", context_snippet("transcript", query, snippet_radius))
        .withColumn("snippet_highlighted", highlight(F.col("snippet"), query))
        .select(
            "video_id", "title", "publish_date", "author", "snippet", "snippet_highlighted"
        )
        .orderBy(desc_nulls_last("publish_date"), F.col("video_id"))
        .limit(limit)
    )
