"""diff-sync, windows, dedup, top-k operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_scraper_db_spark.operators import (
    assign_positions,
    dedup_first_seen,
    next_position,
    ordered_collect,
    top_k_per_group,
)
from youtube_scraper_db_spark.operators.diffsync import (
    diff_keys,
    diff_keys_single_shuffle,
    diff_keys_tagged,
    sync_membership,
)


def test_diff_keys_both_directions(spark):
    cur = spark.createDataFrame([("a",), ("b",)], "k string")
    des = spark.createDataFrame([("b",), ("c",)], "k string")
    add, rem = diff_keys(cur, des, ["k"])
    assert [r.k for r in add.collect()] == ["c"]
    assert [r.k for r in rem.collect()] == ["a"]
    expected = {("c", "add"), ("a", "remove")}
    tagged = {(r.k, r.change) for r in diff_keys_tagged(cur, des, ["k"]).collect()}
    assert tagged == expected
    # single-shuffle form agrees with the anti-join form
    single = {(r.k, r.change) for r in diff_keys_single_shuffle(cur, des, ["k"]).collect()}
    assert single == expected


def test_sync_membership_applies_diff(spark):
    edges = spark.createDataFrame([("p1", "a", 1), ("p1", "b", 2)], "pid string, vid string, position long")
    desired = spark.createDataFrame([("p1", "b", 1), ("p1", "c", 2)], "pid string, vid string, position long")
    out = {(r.pid, r.vid): r.position for r in sync_membership(edges, desired, ["pid", "vid"]).collect()}
    # 'a' removed, 'c' added with desired position, 'b' kept with OLD position
    assert out == {("p1", "b"): 2, ("p1", "c"): 2}


def test_assign_positions_one_based(spark):
    df = spark.createDataFrame([("p1", "x", 10), ("p1", "y", 5), ("p2", "z", 1)], "g string, v string, seq long")
    out = {(r.g, r.v): r.position for r in assign_positions(df, "g", F.col("seq")).collect()}
    assert out == {("p1", "y"): 1, ("p1", "x"): 2, ("p2", "z"): 1}


def test_next_position_empty_group_starts_at_one(spark):
    df = spark.createDataFrame([("p1", 3), ("p1", 7), ("p2", None)], "g string, position long")
    out = {(r.g, r.position): r.next_position for r in next_position(df, "g").collect()}
    assert out[("p1", 3)] == 8 and out[("p1", 7)] == 8
    assert out[("p2", None)] == 1  # all-NULL group → next slot is 1


def test_ordered_collect_is_order_deterministic(spark):
    df = spark.createDataFrame(
        [("g", 2, "b"), ("g", 1, "a"), ("g", 3, "c")], "g string, pos long, v string"
    )
    out = ordered_collect(df, "g", "pos", "v").collect()[0]
    assert out.items == ["a", "b", "c"]


def test_dedup_first_seen_keeps_min_order(spark):
    df = spark.createDataFrame([("k", 2, "late"), ("k", 1, "early")], "k string, seq long, v string")
    rows = dedup_first_seen(df, ["k"], [F.col("seq")]).collect()
    assert len(rows) == 1 and rows[0].v == "early"


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g1", 1), ("g1", 5), ("g1", 3), ("g2", 9)], "g string, v long"
    )
    out = top_k_per_group(df, ["g"], [F.desc("v")], k=2)
    got = sorted((r.g, r.v) for r in out.collect())
    assert got == [("g1", 3), ("g1", 5), ("g2", 9)]


def test_quality_report_single_pass(spark):
    from youtube_scraper_db_spark.operators.quality import quality_report

    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "O"), (3, None, "X"), (3, 7.0, None)],
        ["k", "price", "status"],
    )
    rep = quality_report(
        df,
        {
            "bad_price": F.col("price") > 0,
            "bad_status": F.col("status").isin("O", "F"),
        },
        unique_keys=["k"],
    ).first()
    assert rep.n_rows == 4
    assert rep.bad_price == 2      # -5.0 and NULL both violate
    assert rep.bad_status == 2     # 'X' and NULL both violate
    assert rep.dup_k == 1          # k=3 twice
    # single scan: exactly one FileScan/LocalTableScan in the plan
    plan = (
        quality_report(df, {"p": F.col("price") > 0}, unique_keys=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan") <= 2  # scan + possible reuse marker
