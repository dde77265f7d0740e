"""Explicit StructType schemas for the YouTube-domain tables.

Derived from the reference DDL (never inferred):
- playlists          ref run_me.py:77-85
- videos             ref run_me.py:88-103
- playlist_videos    ref run_me.py:106-115
- transcripts        ref run_me.py:118-126
- playlist_pings     ref main_scraper.py:233-241
- processed_playlists ref playlist_video_extractor.py:24-29

Type mapping per SURVEY.md §1.2: ISO-8601 TEXT timestamps become real
TimestampType (rendered back to ISO strings only at the export edge),
``publish_date`` TEXT YYYY-MM-DD becomes DateType, INTEGER becomes LongType
(view counts exceed int32). Every non-key column is nullable — scrape
failures leave NULLs.

The transcript body is modeled both ways (SURVEY.md §1.2): the flattened
``transcript`` string for parity plus an optional structured
``segments ARRAY<STRUCT<start: DOUBLE, text: STRING>>`` extension column.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


STR = T.StringType()
LONG = T.LongType()
TS = T.TimestampType()
DATE = T.DateType()

#: segments extension type (ref youtube_utils.py:169-190 flattens this away;
#: the roadmap 20250405035749.txt:1493 wants it kept).
TRANSCRIPT_SEGMENTS = T.ArrayType(
    T.StructType([_f("start", T.DoubleType()), _f("text", STR)])
)

PLAYLISTS = T.StructType(
    [
        _f("playlist_id", STR, False),
        _f("title", STR, False),
        _f("url", STR, False),
        _f("item_count", LONG),
        _f("last_updated", TS),
    ]
)

VIDEOS = T.StructType(
    [
        _f("video_id", STR, False),
        _f("title", STR, False),
        _f("description", STR),
        _f("channel", STR),
        _f("publish_date", DATE),
        _f("duration_seconds", LONG),
        _f("view_count", LONG),
        _f("author", STR),
        _f("channel_id", STR),
        _f("thumbnail_url", STR),
        _f("video_url", STR),
        _f("last_scraped_timestamp", TS),
    ]
)

PLAYLIST_VIDEOS = T.StructType(
    [
        _f("playlist_id", STR, False),
        _f("video_id", STR, False),
        _f("position", LONG),
    ]
)

TRANSCRIPTS = T.StructType(
    [
        _f("video_id", STR, False),
        _f("language", STR),
        _f("transcript", STR),
        _f("last_fetched_timestamp", TS),
        _f("segments", TRANSCRIPT_SEGMENTS),
    ]
)

PLAYLIST_PINGS = T.StructType(
    [
        _f("ping_id", LONG, False),
        _f("playlist_id", STR, False),
        _f("pinged_timestamp", TS, False),
        _f("status", STR),
    ]
)

PROCESSED_PLAYLISTS = T.StructType(
    [
        _f("playlist_url", STR, False),
        _f("processed_at", TS, False),
    ]
)

#: primary keys per table — the merge layer keys on these (SURVEY.md §1.1).
PRIMARY_KEYS: dict[str, list[str]] = {
    "playlists": ["playlist_id"],
    "videos": ["video_id"],
    "playlist_videos": ["playlist_id", "video_id"],
    "transcripts": ["video_id"],
    "playlist_pings": ["ping_id"],
    "processed_playlists": ["playlist_url"],
}

SCHEMAS: dict[str, T.StructType] = {
    "playlists": PLAYLISTS,
    "videos": VIDEOS,
    "playlist_videos": PLAYLIST_VIDEOS,
    "transcripts": TRANSCRIPTS,
    "playlist_pings": PLAYLIST_PINGS,
    "processed_playlists": PROCESSED_PLAYLISTS,
}

#: driver testdata tables (TPC-H-ish; see TESTDATA.md) used by the
#: correctness oracle — read straight from parquet, schema comes with it.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
