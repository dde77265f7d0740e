"""The user-facing archive API — everything a user of the reference system
does (`display.py` pages, `web_app.py` endpoints, `run_me.py` /
`main_scraper.py` ETL, `add_transcripts.py` inbox, `export_*.py` tools)
behind one handle over a directory of parquet tables.

Storage model: one parquet directory per table under ``root``. Mutations
are whole-table rewrites (the Delta-free MERGE pattern, SURVEY.md §4)
committed via write-temp-then-swap so a failed job never corrupts the
table; on a cluster the swap becomes a metastore/table-format commit
(Delta/Iceberg), with identical call sites.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from . import schemas
from .operators.diffsync import sync_membership
from .operators.merge import field_update, insert_if_absent, keyed_delete, merge_upsert
from .queries import analytics, catalog, search
from .sinks.export_json import write_playlists_json
from .sinks.render_text import write_transcript_files
from .sources.playlists_json import read_playlists_json
from .sources.transcript_files import read_transcript_files
from .streaming.inbox import transcript_preference_merge


class Archive:
    """A YouTube-archive database on parquet, queried and mutated via Spark."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # -- storage ---------------------------------------------------------

    def _path(self, table: str) -> str:
        return os.path.join(self.root, f"{table}.parquet")

    @classmethod
    def create(cls, spark: SparkSession, root: str) -> "Archive":
        """Initialize empty tables (ref run_me.py:66-131 ensure_database_ready)."""
        os.makedirs(root, exist_ok=True)
        ar = cls(spark, root)
        for name, schema in schemas.SCHEMAS.items():
            if not os.path.exists(ar._path(name)):
                spark.createDataFrame([], schema).write.parquet(ar._path(name))
        return ar

    def table(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def _commit(self, name: str, df: DataFrame) -> None:
        """Rewrite a table atomically: write to a temp dir, then swap.

        The rewrite plan reads the CURRENT table files, so we must fully
        materialize to the temp location before touching them."""
        tmp = self._path(name) + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        final = self._path(name)
        old = final + ".old"
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old)

    # -- ingestion (run_me.py / import_playlists.py / add_transcripts.py) -

    def import_playlists_json(self, path: str) -> int:
        """S2+S11: load playlists.json, insert ids not yet present."""
        incoming = read_playlists_json(self.spark, path)
        merged = insert_if_absent(self.table("playlists"), incoming, ["playlist_id"])
        self._commit("playlists", merged)
        return incoming.count()

    def ingest_transcript_inbox(self, inbox_dir: str) -> int:
        """S9 + the §2.11 preference rule: parse header-formatted files,
        merge into ``transcripts`` (timestamped stored bodies survive
        un-timestamped replacements)."""
        from pyspark.sql import functions as F

        parsed = read_transcript_files(self.spark, inbox_dir)
        incoming = parsed.select(
            "video_id",
            F.lit(None).cast("string").alias("language"),
            "transcript",
            F.current_timestamp().alias("last_fetched_timestamp"),
            F.lit(None).cast(schemas.TRANSCRIPT_SEGMENTS).alias("segments"),
        )
        merged = transcript_preference_merge(self.table("transcripts"), incoming)
        self._commit("transcripts", merged)
        return parsed.count()

    # -- mutations (main_scraper.py sync paths) ---------------------------

    def upsert_videos(self, new_videos: DataFrame) -> None:
        """S10: INSERT OR REPLACE refreshed metadata."""
        self._commit("videos", merge_upsert(self.table("videos"), new_videos, ["video_id"]))

    def sync_playlist_membership(self, desired_edges: DataFrame) -> None:
        """J8+S11/S12 scoped to the playlists present in ``desired_edges``."""
        from pyspark.sql import functions as F

        edges = self.table("playlist_videos")
        touched = desired_edges.select("playlist_id").distinct()
        in_scope = edges.join(touched, "playlist_id", "left_semi")
        untouched = edges.join(touched, "playlist_id", "left_anti")
        synced = sync_membership(in_scope, desired_edges, ["playlist_id", "video_id"])
        self._commit("playlist_videos", untouched.unionByName(synced))

    def remove_video_from_playlists(self, video_id: str, playlist_ids: list[str]) -> None:
        """S12 (ref display.py:692-699 Cross-Links delete)."""
        tombs = self.spark.createDataFrame(
            [(p, video_id) for p in playlist_ids], "playlist_id string, video_id string"
        )
        self._commit(
            "playlist_videos",
            keyed_delete(self.table("playlist_videos"), tombs, ["playlist_id", "video_id"]),
        )

    def update_playlist_counts(self) -> None:
        """A9+S13: recompute item_count per playlist from the edge table."""
        from pyspark.sql import functions as F

        counts = (
            self.table("playlist_videos")
            .groupBy("playlist_id")
            .agg(F.countDistinct("video_id").alias("item_count"))
            .withColumn("last_updated", F.current_timestamp())
        )
        self._commit(
            "playlists",
            field_update(
                self.table("playlists"), counts, ["playlist_id"], ["item_count", "last_updated"]
            ),
        )

    # -- query surface (display.py / gui_app.py / web_app.py) -------------

    def playlist_summary(self) -> DataFrame:
        return catalog.playlist_summary(self.table("playlists"), self.table("playlist_videos"))

    def playlist_videos(self, playlist_id: str) -> DataFrame:
        return catalog.playlist_videos_with_flags(
            self.table("playlist_videos"), self.table("videos"),
            self.table("transcripts"), playlist_id,
        )

    def video(self, video_id: str) -> DataFrame:
        return catalog.video_detail(self.table("videos"), self.table("transcripts"), video_id)

    def video_playlists(self, video_id: str) -> DataFrame:
        return catalog.video_playlists(
            self.table("playlists"), self.table("playlist_videos"), video_id
        )

    def stats(self) -> DataFrame:
        return analytics.summary_stats(
            self.table("playlists"), self.table("videos"),
            self.table("transcripts"), self.table("playlist_videos"),
        )

    def cross_links(self, approx: bool = False) -> DataFrame:
        return analytics.cross_linked_videos(
            self.table("playlist_videos"), self.table("videos"), approx
        )

    def top_channels(self, k: int = 5) -> DataFrame:
        return analytics.top_channels(self.table("videos"), k)

    def playlist_stats(self) -> DataFrame:
        return analytics.per_playlist_stats(
            self.table("playlists"), self.table("playlist_videos"), self.table("videos")
        )

    def search_titles(self, query: str, limit: int = 100) -> DataFrame:
        return search.search_titles(
            self.table("videos"), self.table("playlist_videos"),
            self.table("playlists"), query, limit,
        )

    def search_transcripts(self, query: str, limit: int = 50) -> DataFrame:
        return search.search_transcripts(
            self.table("transcripts"), self.table("videos"), query, limit
        )

    # -- exports (export_*.py) --------------------------------------------

    def export_playlists_json(self, path: str) -> None:
        write_playlists_json(self.table("playlists"), self.table("playlist_videos"), path)

    def export_transcript_files(self, out_dir: str) -> int:
        from pyspark.sql import functions as F

        joined = (
            self.table("videos")
            .join(self.table("transcripts"), "video_id")
            .filter(F.col("transcript").isNotNull() & (F.col("transcript") != ""))
        )
        return write_transcript_files(joined, out_dir)
