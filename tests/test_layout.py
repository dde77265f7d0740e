"""Z-order layout: per-file footer stats must cover small 2-D regions,
and a 2-D box predicate must prune more files than a linear layout."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from youtube_scraper_db_spark.operators.layout import write_zordered


def _grid(spark, n=20_000):
    # two independent uniform dims derived from a hash — deterministic
    return (
        spark.range(n)
        .select(
            (F.abs(F.xxhash64(F.col("id"))) % 1024).alias("x"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % 1024).alias("y"),
        )
    )


def _file_boxes(path):
    """Per-file (xmin, xmax, ymin, ymax) from parquet footer stats."""
    boxes = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        xi, yi = names.index("x"), names.index("y")
        xmn = min(md.row_group(g).column(xi).statistics.min for g in range(md.num_row_groups))
        xmx = max(md.row_group(g).column(xi).statistics.max for g in range(md.num_row_groups))
        ymn = min(md.row_group(g).column(yi).statistics.min for g in range(md.num_row_groups))
        ymx = max(md.row_group(g).column(yi).statistics.max for g in range(md.num_row_groups))
        boxes.append((xmn, xmx, ymn, ymx))
    return boxes


def _hits(boxes, x0, x1, y0, y1):
    """Files whose stats-box intersects the query box (what a pruning
    scan must read)."""
    return sum(
        1 for (xmn, xmx, ymn, ymx) in boxes
        if not (xmx < x0 or xmn > x1 or ymx < y0 or ymn > y1)
    )


def test_zorder_files_cover_small_regions(spark, tmp_path):
    df = _grid(spark)
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(df, zpath, ["x", "y"], n_files=16, bits=10)
    # linear baseline: sorted by x only, same file count
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    zboxes, lboxes = _file_boxes(zpath), _file_boxes(lpath)
    assert len(zboxes) == 16

    def avg_area(boxes):
        return sum(
            (xmx - xmn + 1) * (ymx - ymn + 1) / (1024.0 * 1024.0)
            for (xmn, xmx, ymn, ymx) in boxes
        ) / len(boxes)

    # A linear sort also yields area-1/16 stripes — area alone doesn't
    # separate the layouts. The Z-property is that the region is
    # square-ish: BOTH extents shrink, so predicates on either dim
    # prune. The x-sorted baseline spans the full y range in every file.
    assert avg_area(zboxes) < 0.25, avg_area(zboxes)
    z_yext = sum(ymx - ymn + 1 for (_, _, ymn, ymx) in zboxes) / len(zboxes)
    l_yext = sum(ymx - ymn + 1 for (_, _, ymn, ymx) in lboxes) / len(lboxes)
    assert l_yext > 1000  # stripes are blind in y
    assert z_yext < 0.6 * l_yext, (z_yext, l_yext)

    # row count survives the layout
    assert spark.read.parquet(zpath).count() == 20_000


def test_zorder_prunes_2d_box_queries(spark, tmp_path):
    df = _grid(spark)
    zpath = str(tmp_path / "zorder2")
    lpath = str(tmp_path / "linear2")
    write_zordered(df, zpath, ["x", "y"], n_files=16, bits=10)
    (
        df.repartitionByRange(16, "y")
        .sortWithinPartitions("y")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    zboxes, lboxes = _file_boxes(zpath), _file_boxes(lpath)

    # 2-D boxes: a 1/64-area box must touch well under half the
    # z-ordered files on average (measured 1.8-2.7 across session
    # states; the bound leaves margin for repartitionByRange's
    # sampled range boundaries, which vary with session history)
    boxes_2d = [
        (x0, x0 + 127, y0, y0 + 127)
        for x0 in (0, 256, 512, 768)
        for y0 in (0, 256, 512, 768)
    ]
    z_2d = sum(_hits(zboxes, *q) for q in boxes_2d)
    assert z_2d / len(boxes_2d) <= 8, z_2d / len(boxes_2d)

    # x-only predicates are where the layouts genuinely separate: the
    # y-sorted stripes span the full x range in every file (blind —
    # every query reads all 16), while z-order files cover ~1/4 of x
    # each. (A 2-D-box comparison is NOT discriminative at this file
    # count: y-stripes prune y-constrained boxes almost as well as
    # z-order does, and the comparison flips on boundary noise.)
    xqueries = [(x0, x0 + 127, 0, 1023) for x0 in (0, 256, 512, 768)]
    z_x = sum(_hits(zboxes, *q) for q in xqueries)
    l_x = sum(_hits(lboxes, *q) for q in xqueries)
    assert l_x == 16 * len(xqueries), l_x  # stripes read everything
    assert z_x <= 0.66 * l_x, (z_x, l_x)


# --- Hilbert curve (round 10) -----------------------------------------


def _ref_xy2d(order: int, x: int, y: int) -> int:
    """Independent reference: the classic Wikipedia xy2d with full-size
    reflections — intentionally NOT the masked per-level form the
    operator unrolls, so a transcription bug in either cannot hide."""
    n = 1 << order
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_reference_is_bijective_unit_step():
    order = 4
    n = 1 << order
    cells = {}
    for x in range(n):
        for y in range(n):
            cells[_ref_xy2d(order, x, y)] = (x, y)
    assert sorted(cells) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = cells[d], cells[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_keyed_matches_reference_grid(spark):
    from youtube_scraper_db_spark.operators.layout import hilbert_keyed

    order = 4
    n = 1 << order
    rows = [(x * n + y, x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    # min=0/max=n-1 → the floor normalization is the identity on the grid
    got = {
        r["id"]: r["hkey"]
        for r in hilbert_keyed(df, ["a", "b"], bits=order).collect()
    }
    for x in range(n):
        for y in range(n):
            assert got[x * n + y] == _ref_xy2d(order, x, y), (x, y)


def test_hilbert_locality_beats_zorder_on_avg_jump(spark):
    """The curve's selling point, measured: mean spatial distance
    between consecutive curve positions is exactly 1 for Hilbert,
    >1 for the Z-curve (diagonal jumps)."""
    from youtube_scraper_db_spark.operators.layout import hilbert_keyed, zorder_key

    order = 4
    n = 1 << order
    rows = [(x * n + y, x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    h = {
        r["hkey"]: (r["a"], r["b"])
        for r in hilbert_keyed(df, ["a", "b"], bits=order).select(
            "hkey", "a", "b"
        ).collect()
    }
    z = {
        r["zkey"]: (r["a"], r["b"])
        for r in df.select(
            zorder_key(df, ["a", "b"], bits=order).alias("zkey"), "a", "b"
        ).collect()
    }

    def mean_jump(m):
        ks = sorted(m)
        return sum(
            abs(m[a][0] - m[b][0]) + abs(m[a][1] - m[b][1])
            for a, b in zip(ks, ks[1:])
        ) / (len(ks) - 1)

    assert mean_jump(h) == 1.0
    assert mean_jump(z) > 1.2
