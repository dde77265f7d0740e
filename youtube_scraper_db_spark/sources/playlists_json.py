"""JSON playlist source (S2; ref run_me.py:133-179, import_playlists.py:24-50,
generate_playlists.py:43-50).

The file is a JSON array of ``{playlist_id | id, title, url?}`` objects; the
reference tolerates the ``id`` key variant, synthesizes a missing ``url``
from the id, and skips records missing id or title (P11). All of that is
declarative here: one multiLine JSON scan + coalesce/concat/filter — the
whole parse stays in Catalyst, so at scale a directory of such files is
just a parallel JSON scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PLAYLIST_URL_PREFIX = "https://www.youtube.com/playlist?list="


def read_playlists_json(spark: SparkSession, path: str) -> DataFrame:
    """Load playlist records → ``(playlist_id, title, url, item_count,
    last_updated)`` conforming to the ``playlists`` schema (metadata columns
    NULL until a scrape fills them)."""
    raw = spark.read.option("multiLine", True).json(path)
    cols = set(raw.columns)
    pid_sources = [F.col(c) for c in ("playlist_id", "id") if c in cols]
    pid = F.coalesce(*pid_sources) if pid_sources else F.lit(None).cast("string")
    title = F.col("title") if "title" in cols else F.lit(None).cast("string")
    url_raw = F.col("url") if "url" in cols else F.lit(None).cast("string")
    return (
        raw.select(
            pid.alias("playlist_id"),
            title.alias("title"),
            F.coalesce(
                F.nullif(F.trim(url_raw), F.lit("")),
                F.concat(F.lit(PLAYLIST_URL_PREFIX), pid),
            ).alias("url"),
            F.lit(None).cast("long").alias("item_count"),
            F.lit(None).cast("timestamp").alias("last_updated"),
        )
        # P11 validity filter (ref run_me.py:158-160): id and title required.
        .filter(
            F.col("playlist_id").isNotNull()
            & (F.trim("playlist_id") != "")
            & F.col("title").isNotNull()
        )
    )
