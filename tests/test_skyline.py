"""Skyline operator (operators/skyline.py) vs brute force.

The registry gate proves optimized ≡ naive on the part table; these
tests stress shapes the table doesn't have: ties on both axes,
duplicate points, constant columns, NULLs, and adversarial bucket
boundaries.
"""

from __future__ import annotations

import random

from youtube_scraper_db_spark.operators.skyline import pareto_frontier


def _brute(points):
    out = []
    for i, (px, py) in enumerate(points):
        dominated = any(
            (qx <= px and qy >= py and (qx < px or qy > py))
            for j, (qx, qy) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((px, py))
    return sorted(set(out))


def _run(spark, points, bits=3):
    rows = [(i, float(x), int(y)) for i, (x, y) in enumerate(points)]
    df = spark.createDataFrame(rows, "id long, price double, size long")
    got = sorted(
        set(
            (r["price"], r["size"])
            for r in pareto_frontier(df, "price", "size", bits).collect()
        )
    )
    assert got == _brute(points), points[:8]


def test_random_points(spark):
    rnd = random.Random(7)
    pts = [(rnd.randint(0, 60) / 2.0, rnd.randint(0, 30)) for _ in range(200)]
    _run(spark, pts)


def test_duplicates_and_ties(spark):
    # duplicate points dominate each other? no — dominance needs strict
    # on one axis, so exact duplicates BOTH survive if undominated
    pts = [(1.0, 10), (1.0, 10), (2.0, 10), (1.0, 9), (0.5, 10)]
    _run(spark, pts)


def test_constant_minimize_column(spark):
    pts = [(5.0, y) for y in (1, 9, 9, 3)]
    _run(spark, pts)


def test_single_row_and_monotone_chain(spark):
    _run(spark, [(1.0, 1)])
    # strictly worsening chain: price rises AND size falls along i, so
    # (0.0, 100) dominates everything — only it survives
    _run(spark, [(float(i), 100 - i) for i in range(20)])
    # trade-off chain: price and size both rise, so no point dominates
    # another (dominance needs <= price AND >= size, strict on one) —
    # every point is Pareto-optimal
    _run(spark, [(float(i), i) for i in range(20)])


def test_nulls_excluded(spark):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("size", T.LongType()),
        ]
    )
    df = spark.createDataFrame(
        [(0, 1.0, 5), (1, None, 99), (2, 0.5, None), (3, 2.0, 6)], schema
    )
    got = sorted(
        (r["price"], r["size"])
        for r in pareto_frontier(df, "price", "size").collect()
    )
    assert got == [(1.0, 5), (2.0, 6)]


def test_grouped_frontier_matches_per_group_brute(spark):
    import itertools

    from youtube_scraper_db_spark.operators.skyline import (
        pareto_frontier_grouped,
    )

    rows = []
    for g in ("a", "b", "c"):
        base = ord(g)
        rows += [
            (g, i, float((i * 7 + base) % 13), (i * 5 + base) % 11)
            for i in range(40)
        ]
    rows.append((None, 999, 1.0, 1))       # NULL group excluded
    rows.append(("a", 998, None, 50))       # NULL measure excluded
    df = spark.createDataFrame(
        rows, "g string, id long, price double, size long"
    )
    got = sorted(
        (r["g"], r["id"])
        for r in pareto_frontier_grouped(df, "g", "price", "size").collect()
    )

    def brute(pts):
        out = []
        for p in pts:
            if not any(
                q[2] <= p[2] and q[3] >= p[3] and (q[2] < p[2] or q[3] > p[3])
                for q in pts
            ):
                out.append((p[0], p[1]))
        return out

    valid = [r for r in rows if r[0] is not None and r[2] is not None]
    expected = sorted(
        x
        for g, pts in itertools.groupby(
            sorted(valid, key=lambda r: r[0]), key=lambda r: r[0]
        )
        for x in brute(list(pts))
    )
    assert got == expected
