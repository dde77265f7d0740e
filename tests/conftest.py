"""Shared Spark fixture + YouTube-domain fixture tables.

Fixture data follows FIXTURES.md distributions in miniature: empty
playlists, cross-linked videos, NULL timestamps/durations, transcripts
with/without timestamps, blank titles.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import SparkSession

from youtube_scraper_db_spark import schemas
from youtube_scraper_db_spark.session import get_spark

UTC = dt.timezone.utc


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s).replace(tzinfo=UTC)


def d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark("tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def playlists(spark):
    rows = [
        ("PL001", "Alpha Mix", "https://www.youtube.com/playlist?list=PL001", 3, ts("2024-01-10T00:00:00")),
        ("PL002", "beta mix", "https://www.youtube.com/playlist?list=PL002", None, None),
        ("PL003", "Empty One", "https://www.youtube.com/playlist?list=PL003", 0, ts("2024-01-05T00:00:00")),
        ("PL004", "", "https://www.youtube.com/playlist?list=PL004", 1, None),
    ]
    return spark.createDataFrame(rows, schema=schemas.PLAYLISTS)


@pytest.fixture(scope="session")
def videos(spark):
    rows = [
        ("vid00000001", "Spark SQL intro", "desc", None, d("2024-01-01"), 3723, 1000, "ChanA", None, None, None, ts("2024-01-09T00:00:00")),
        ("vid00000002", "spark streaming DEEP dive", None, None, d("2024-01-02"), 120, 50, "ChanA", None, None, None, ts("2024-01-02T00:00:00")),
        ("vid00000003", "Cooking pasta", "yum", None, None, 45, None, "ChanB", None, None, None, None),
        ("vid00000004", "Orphan video", None, None, d("2023-12-01"), None, 7, None, None, None, None, ts("2023-11-01T00:00:00")),
    ]
    return spark.createDataFrame(rows, schema=schemas.VIDEOS)


@pytest.fixture(scope="session")
def playlist_videos(spark):
    rows = [
        ("PL001", "vid00000001", 1),
        ("PL001", "vid00000002", 2),
        ("PL001", "vid00000003", 3),
        ("PL002", "vid00000001", 1),  # cross-linked with PL001
        ("PL004", "vid00000002", 1),
    ]
    return spark.createDataFrame(rows, schema=schemas.PLAYLIST_VIDEOS)


@pytest.fixture(scope="session")
def transcripts(spark):
    rows = [
        ("vid00000001", "en", "[00:00] hello spark world [00:15] more text", ts("2024-01-09T00:00:00"), None),
        ("vid00000002", "en", "plain transcript about streaming joins", ts("2024-01-02T00:00:00"), None),
        ("vid00000003", "en", "", ts("2024-01-01T00:00:00"), None),  # empty body
    ]
    return spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)
