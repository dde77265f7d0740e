"""Mutation layer (S10-S13) — the hardest-to-get-right part per SURVEY §7.3."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_scraper_db_spark.operators import merge


def _df(spark, rows, schema="k string, v long"):
    return spark.createDataFrame(rows, schema)


def test_merge_upsert_replaces_and_inserts(spark):
    old = _df(spark, [("a", 1), ("b", 2)])
    new = _df(spark, [("b", 20), ("c", 30)])
    out = {r.k: r.v for r in merge.merge_upsert(old, new, ["k"]).collect()}
    assert out == {"a": 1, "b": 20, "c": 30}


def test_merge_upsert_dedups_new_side(spark):
    old = _df(spark, [("a", 1)])
    new = _df(spark, [("a", 2), ("a", 3)])
    rows = merge.merge_upsert(old, new, ["k"]).collect()
    assert len(rows) == 1 and rows[0].k == "a" and rows[0].v in (2, 3)


def test_insert_if_absent_ignores_existing(spark):
    old = _df(spark, [("a", 1)])
    new = _df(spark, [("a", 99), ("b", 2)])
    out = {r.k: r.v for r in merge.insert_if_absent(old, new, ["k"]).collect()}
    assert out == {"a": 1, "b": 2}  # existing key untouched (INSERT OR IGNORE)


def test_keyed_delete(spark):
    old = _df(spark, [("a", 1), ("b", 2), ("c", 3)])
    tomb = _df(spark, [("b", 0)])
    out = sorted(r.k for r in merge.keyed_delete(old, tomb, ["k"]).collect())
    assert out == ["a", "c"]


def test_field_update_sets_null_too(spark):
    old = spark.createDataFrame([("a", 1, "x"), ("b", 2, "y")], "k string, v long, w string")
    upd = spark.createDataFrame([("a", None)], "k string, v long")
    out = {r.k: (r.v, r.w) for r in merge.field_update(old, upd, ["k"], ["v"]).collect()}
    # matched row takes the new value even when NULL (SQL UPDATE semantics);
    # untouched column w passes through
    assert out == {"a": (None, "x"), "b": (2, "y")}


def test_when_matched_keep_better_transcript_rule(spark):
    # intended rule (README.md:120): new transcript wins UNLESS the old one
    # has timestamps and the new one doesn't
    schema = "video_id string, transcript string, has_ts boolean"
    old = spark.createDataFrame(
        [("v1", "[00:01] timestamped old", True), ("v2", "plain old", False)], schema
    )
    new = spark.createDataFrame(
        [("v1", "plain new", False), ("v2", "plain newer", False), ("v3", "brand new", False)],
        schema,
    )
    prefer_old = F.col("has_ts_old") & ~F.col("has_ts_new")
    out = {
        r.video_id: r.transcript
        for r in merge.when_matched_keep_better(old, new, "video_id", prefer_old).collect()
    }
    assert out == {
        "v1": "[00:01] timestamped old",  # old kept: timestamped beats plain
        "v2": "plain newer",              # new wins otherwise
        "v3": "brand new",                # pure insert
    }
