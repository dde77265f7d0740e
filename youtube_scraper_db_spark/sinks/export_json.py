"""Ordered nested JSON export (S14, W3; ref export_playlists.py:36-63).

The reference walks playlists NOCASE-sorted and emits, per playlist, its
video ids ordered by position. Spark-first that is one aggregation:
``sort_array(collect_list(struct(position, video_id)))`` gives the ordered
list without relying on within-partition input order (which a window +
``collect_list`` would need); the struct sort key is dropped after the
sort. One shuffle on playlist_id, independent of playlist count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..semantics import nocase


def playlists_nested(playlists: DataFrame, playlist_videos: DataFrame) -> DataFrame:
    """``(playlist_id, title, url, video_ids: array<string>)`` — video ids
    in position order; empty playlists get an empty array (left join)."""
    ordered = (
        playlist_videos.groupBy("playlist_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("position", "video_id"))),
                lambda s: s["video_id"],
            ).alias("video_ids")
        )
    )
    return (
        playlists.join(ordered, "playlist_id", "left")
        .select(
            "playlist_id",
            "title",
            "url",
            F.coalesce("video_ids", F.array().cast("array<string>")).alias(
                "video_ids"
            ),
        )
        .orderBy(nocase("title"))
    )


def write_playlists_json(
    playlists: DataFrame, playlist_videos: DataFrame, path: str
) -> None:
    """Write the nested export as JSON-lines. Partitioned write — at scale
    each output partition streams independently; the reference's single
    in-memory JSON array is the ``coalesce(1)`` degenerate case a caller
    can opt into."""
    playlists_nested(playlists, playlist_videos).write.mode("overwrite").json(path)
