"""Keyed mutation layer on immutable storage (SURVEY.md §2.1 S10-S13).

SQLite's ``INSERT OR REPLACE`` / ``INSERT OR IGNORE`` / ``UPDATE`` /
``DELETE`` become pure DataFrame rewrites built from anti-joins — the
Delta-free MERGE pattern (SURVEY.md §4). At scale, each of these is one
shuffle-free broadcast anti-join when the mutation batch is small (the
common case: one scrape run touches a few thousand keys), or a sort-merge
anti-join when both sides are large; AQE picks per-run.

Design invariant: `new` wins on key collision, exactly like
``INSERT OR REPLACE`` (ref youtube_utils.py:237-258).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(old: DataFrame, new: DataFrame, keys: Sequence[str]) -> DataFrame:
    """``INSERT OR REPLACE`` (S10; ref youtube_utils.py:237-258,
    scrape_my_channel.py:615-637): keep every ``new`` row, plus the ``old``
    rows whose key is absent from ``new``.

    ``new`` is deduplicated on the key first (last-writer-wins is
    meaningless in a set-oriented batch; we take an arbitrary-but-single
    row per key via dropDuplicates) so the output preserves key uniqueness.
    """
    new_unique = new.dropDuplicates(list(keys))
    survivors = old.join(new_unique.select(*keys), on=list(keys), how="left_anti")
    return survivors.unionByName(new_unique, allowMissingColumns=True)


def insert_if_absent(old: DataFrame, new: DataFrame, keys: Sequence[str]) -> DataFrame:
    """``INSERT OR IGNORE`` (S11; ref main_scraper.py:161,
    import_playlists.py:42-49): append only keys not already present."""
    fresh = new.dropDuplicates(list(keys)).join(
        old.select(*keys), on=list(keys), how="left_anti"
    )
    return old.unionByName(fresh, allowMissingColumns=True)


def keyed_delete(old: DataFrame, tombstones: DataFrame, keys: Sequence[str]) -> DataFrame:
    """``DELETE WHERE key IN (...)`` (S12; ref main_scraper.py:163-167,
    display.py:692-699): anti-join the tombstone keys away."""
    return old.join(tombstones.select(*keys).distinct(), on=list(keys), how="left_anti")


def field_update(
    old: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    set_cols: Sequence[str],
) -> DataFrame:
    """``UPDATE t SET c=? WHERE key=?`` (S13; ref main_scraper.py:296-299,
    update_playlists_metadata.py:85-88): left-join the update batch and
    coalesce per updated column; untouched rows/columns pass through.

    ``updates`` must carry ``keys + set_cols``. A matched row takes the new
    value even when it is NULL — matching SQL UPDATE semantics — which is
    why we join on a match flag rather than coalescing values directly.
    """
    upd = updates.select(*keys, *set_cols).dropDuplicates(list(keys))
    renamed = upd
    for c in set_cols:
        renamed = renamed.withColumnRenamed(c, f"__new_{c}")
    matched = F.lit(True).alias("__matched")
    # No forced broadcast: the common case (a scrape run's small update
    # batch) broadcasts anyway once AQE sees its runtime size, while a
    # large backfill touching most keys gets a sort-merge join instead of
    # OOMing every executor with a broadcast it can't hold.
    joined = old.join(
        renamed.select("*", matched),
        on=list(keys),
        how="left",
    )
    out = joined
    for c in set_cols:
        out = out.withColumn(
            c, F.when(F.col("__matched").isNotNull(), F.col(f"__new_{c}")).otherwise(F.col(c))
        )
    return out.drop("__matched", *[f"__new_{c}" for c in set_cols]).select(*old.columns)


def when_matched_keep_better(
    old: DataFrame,
    new: DataFrame,
    key: str,
    prefer_old: Column,
) -> DataFrame:
    """Conditional upsert: new row wins **unless** ``prefer_old`` holds for
    the matched pair — the *intended* transcript-preference rule (keep an
    existing timestamped transcript over a new un-timestamped one;
    ref add_transcripts.py:174-186 + README.md:120; the reference
    implementation is buggy, SURVEY.md §2.11 — semantics come from the
    README).

    ``prefer_old`` is evaluated against columns suffixed ``_old`` / ``_new``.
    """
    o = old.select([F.col(c).alias(f"{c}_old") for c in old.columns])
    n = new.dropDuplicates([key]).select([F.col(c).alias(f"{c}_new") for c in new.columns])
    joined = o.join(n, F.col(f"{key}_old") == F.col(f"{key}_new"), "full_outer")
    take_old = F.col(f"{key}_new").isNull() | (F.col(f"{key}_old").isNotNull() & prefer_old)
    out_cols = [
        F.when(take_old, F.col(f"{c}_old")).otherwise(F.col(f"{c}_new")).alias(c)
        for c in old.columns
    ]
    return joined.select(*out_cols)
