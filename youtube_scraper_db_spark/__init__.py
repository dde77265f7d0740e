"""youtube_scraper_db_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference project ``Jsgordon420365/youtube-scraper-db`` (a SQLite-backed
YouTube playlist/video/transcript archive), re-expressed Spark-first:
DataFrame/SQL plans optimized by Catalyst, Parquet storage, broadcast/AQE
join strategies, and Arrow-batched pandas UDFs only where built-ins cannot
express the semantics.

Layout
------
- ``session``    : tuned SparkSession builder.
- ``schemas``    : explicit StructTypes for the YouTube-domain tables.
- ``semantics``  : SQLite-parity helpers (case-insensitive LIKE, NOCASE sort,
                   deterministic group-by attribution, null ordering).
- ``functions``  : scalar column expressions (SURVEY.md §2.8 F1-F17).
- ``operators``  : merge/upsert, diff-sync, window ops, top-k (§2.3-§2.7).
- ``queries``    : the interactive query surface (§3.3) as composable fns.
- ``sources``    : JSON playlist reader, transcript-file parser, mockable
                   fetch stages (§2.1).
- ``pipelines``  : incremental refresh + export pipelines (§2.9, §3.1-3.2).
- ``streaming``  : Structured Streaming inbox source (T5).
- ``llm``        : scale extensions — dedup, similarity search, text
                   analysis, multimodal columns.
"""

__version__ = "0.1.0"
