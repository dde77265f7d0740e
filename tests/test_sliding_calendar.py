"""Sliding-calendar family (round 11): the (grain, width)-parameterized
leaf-store services — KMV (operators/kmv.py), HLL register tables
(operators/sketches.py), Misra-Gries heavy hitters
(operators/heavy_hitters.py). Window merges must equal direct builds
(merge exactness) and the MG candidate-union recount must be exact."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from youtube_scraper_db_spark.operators import kmv as op_kmv
from youtube_scraper_db_spark.operators import sketches as op_sk
from youtube_scraper_db_spark.operators.heavy_hitters import (
    mg_sliding_heavy_hitters,
)


def _events(spark):
    # 10 days; day d has users [0 .. 3d] (growing), plus a dominant
    # user 999 with 2d+1 events on every day (a guaranteed heavy hitter)
    rows = []
    base = dt.datetime(2024, 3, 1)
    for d in range(10):
        day = base + dt.timedelta(days=d)
        rows += [(day, f"u{u}") for u in range(3 * d + 1)]
        rows += [(day, "u999")] * (2 * d + 1)
    return spark.createDataFrame(rows, "ts timestamp, user string")


def test_kmv_width_one_equals_per_leaf_sketch(spark):
    ev = _events(spark)
    leaves = op_kmv.kmv_leaf_sketches(ev, "ts", "user", 8, "day")
    est_w1 = op_kmv.kmv_sliding_estimates(leaves, 8, 1, "day")
    grouped = op_kmv.kmv_estimate_grouped(
        op_kmv.kmv_sketch_grouped(
            ev.withColumn("d", F.date_trunc("day", "ts")), "d", "user", 8
        ),
        8,
    )
    a = {
        r["wend"]: (r["estimate"], r["sketch_size"], r["kth_hash"])
        for r in est_w1.collect()
    }
    b = {
        dt.datetime.fromisoformat(r["g"]): (
            r["estimate"],
            r["sketch_size"],
            r["kth_hash"],
        )
        for r in grouped.collect()
    }
    assert a == b


def test_kmv_window_merge_equals_direct_window_sketch(spark):
    ev = _events(spark)
    k, width = 8, 4
    leaves = op_kmv.kmv_leaf_sketches(ev, "ts", "user", k, "day")
    est = {
        r["wend"]: (r["sketch_size"], r["kth_hash"])
        for r in op_kmv.kmv_sliding_estimates(leaves, k, width, "day").collect()
    }
    for wend, (size, kth) in est.items():
        lo = wend - dt.timedelta(days=width - 1)
        direct = op_kmv.kmv_sketch(
            ev.where(
                (F.date_trunc("day", "ts") >= F.lit(lo))
                & (F.date_trunc("day", "ts") <= F.lit(wend))
            ),
            "user",
            k,
        )
        hashes = [r["h"] for r in direct.collect()]
        assert (len(hashes), max(hashes)) == (size, kth)


def test_hll_window_merge_equals_direct_registers(spark):
    ev = _events(spark)
    width = 3
    leaves = op_sk.hll_leaf_registers(ev, "ts", "user", "day")
    slid = {
        r["wend"]: (r["estimate"], r["nonzero_registers"])
        for r in op_sk.hll_sliding_estimates(leaves, width, "day").collect()
    }
    for wend, got in slid.items():
        lo = wend - dt.timedelta(days=width - 1)
        win = ev.where(
            (F.date_trunc("day", "ts") >= F.lit(lo))
            & (F.date_trunc("day", "ts") <= F.lit(wend))
        )
        direct = op_sk.hll_estimate_from_registers(
            op_sk.hll_registers(win, "user")
        ).first()
        assert (direct["estimate"], direct["nonzero_registers"]) == got


def test_mg_sliding_exact_vs_brute(spark):
    ev = _events(spark)
    k, width = 4, 3
    got = sorted(
        (r["wend"], r["user"], r["cnt"], r["n_total"])
        for r in mg_sliding_heavy_hitters(
            ev, "ts", "user", k, width, "day"
        ).collect()
    )
    rows = ev.collect()
    days = sorted({r["ts"].replace(hour=0) for r in rows})
    expected = []
    for wend in days:
        lo = wend - dt.timedelta(days=width - 1)
        win = [r for r in rows if lo <= r["ts"] <= wend]
        n = len(win)
        from collections import Counter

        for u, c in Counter(r["user"] for r in win).items():
            if c * k > n:
                expected.append((wend, u, c, n))
    assert got == sorted(expected)
    # the dominant user must actually be caught somewhere
    assert any(u == "u999" for _, u, _, _ in got)


def test_spine_window_ends_and_leaves(spark):
    from youtube_scraper_db_spark.operators import sliding

    ev = _events(spark)
    leaves = op_kmv.kmv_leaf_sketches(ev, "ts", "user", 8, "day")
    ends = sliding.window_ends(leaves)
    assert ends.count() == 10  # one end per day with a leaf
    # width-3 windows: day d's window holds leaves of days d-2..d, so
    # the tagged row count is sum over ends of min(3, d+1)
    tagged = sliding.window_leaves(
        leaves.select("leaf").distinct(), 3, "day"
    )
    per_end = {
        r.wend.day: r.n
        for r in tagged.groupBy("wend")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_end[1] == 1 and per_end[2] == 2
    assert all(per_end[d] == 3 for d in range(3, 11))


def test_spine_null_key_day_produces_no_end(spark):
    # the ADVICE alignment: a day whose keys are ALL null must produce
    # no leaf and therefore no window end, on the engine side too
    from youtube_scraper_db_spark.operators import sliding

    ev = _events(spark).unionByName(
        spark.createDataFrame(
            [(dt.datetime(2024, 3, 20), None)], "ts timestamp, user string"
        )
    )
    leaves = op_kmv.kmv_leaf_sketches(ev, "ts", "user", 8, "day")
    ends = {r.wend.day for r in sliding.window_ends(leaves).collect()}
    assert 20 not in ends and len(ends) == 10


def test_spine_cross_family_same_ends(spark):
    # the sliding_spine_consistency gate's property in miniature: KMV
    # and HLL leaves from the same spine expose identical window ends
    from youtube_scraper_db_spark.operators import sliding

    ev = _events(spark)
    ke = sliding.window_ends(op_kmv.kmv_leaf_sketches(ev, "ts", "user", 8))
    he = sliding.window_ends(op_sk.hll_leaf_registers(ev, "ts", "user"))
    assert ke.exceptAll(he).count() == 0
    assert he.exceptAll(ke).count() == 0
