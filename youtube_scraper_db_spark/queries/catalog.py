"""Catalog/browse queries (SURVEY.md §3.3 Playlists page; J1-J3, P2, P8,
O2-O6, F1).

These are the Streamlit `display.py` / `gui_app.py` read paths re-expressed
as composable DataFrame functions over the YouTube-domain tables. Plan
shape at scale: `playlists` is a tiny dimension → broadcast side of every
join; `playlist_videos`/`videos` shuffle on their join key once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import format_duration
from ..semantics import desc_nulls_last, nocase


def playlist_summary(playlists: DataFrame, playlist_videos: DataFrame) -> DataFrame:
    """J1/A2/O2 (ref display.py:74-82): per-playlist video count including
    empty playlists, ordered by count desc then title."""
    counts = (
        playlists.join(playlist_videos, "playlist_id", "left")
        .groupBy("playlist_id", "title")
        .agg(F.count("video_id").alias("video_count"))
    )
    return counts.orderBy(desc_nulls_last("video_count"), nocase("title"))


def playlist_videos_with_flags(
    playlist_videos: DataFrame,
    videos: DataFrame,
    transcripts: DataFrame,
    playlist_id: str,
) -> DataFrame:
    """J2+J3/P8/O3 (ref display.py:88-107): videos of one playlist with a
    ``has_transcript`` flag from a left-join existence probe; join-time
    residual predicate drops empty transcript bodies (P9, ref gui_app.py:62).
    """
    t = transcripts.select("video_id", "transcript")
    probe = t.filter(F.col("transcript").isNotNull() & (F.col("transcript") != "")).select(
        "video_id"
    ).distinct()
    return (
        playlist_videos.filter(F.col("playlist_id") == playlist_id)
        .join(videos, "video_id", "inner")
        .join(probe.withColumn("__has_t", F.lit(1)), "video_id", "left")
        .withColumn("has_transcript", F.when(F.col("__has_t").isNotNull(), 1).otherwise(0))
        .drop("__has_t")
        .withColumn("duration_display", format_duration("duration_seconds"))
        .orderBy(desc_nulls_last("publish_date"))
    )


def video_playlists(
    playlists: DataFrame, playlist_videos: DataFrame, video_id: str
) -> DataFrame:
    """Cross-Links drill-down (ref display.py:109-124): every playlist
    containing one video, NOCASE-ordered. Broadcast point filter → the
    edge scan prunes on video_id."""
    return (
        playlist_videos.filter(F.col("video_id") == video_id)
        .join(playlists, "playlist_id", "inner")
        .select("playlist_id", "title", "position")
        .orderBy(nocase("title"))
    )


def video_detail(videos: DataFrame, transcripts: DataFrame, video_id: str) -> DataFrame:
    """P2 point lookups (ref display.py:51-67, web_app.py:62-67): one video
    joined to its transcript. Parquet min/max skipping serves the point
    predicate at scale."""
    return (
        videos.filter(F.col("video_id") == video_id)
        .join(transcripts, "video_id", "left")
    )
