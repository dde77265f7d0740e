"""Z-order (interleaved-bits) data layout — multi-dimensional data
skipping for parquet scans.

Sorting a table by one column makes min/max footer stats razor-sharp for
that column and useless for every other. Interleaving the bits of k
rank-normalized columns into one sort key (the Z-order / Morton curve)
makes every file cover a small HYPER-RECTANGLE of the k-dim space, so a
selective predicate on ANY subset of those columns prunes most files
from the scan — the standard layout trick of the lakehouse table formats,
expressed here with nothing but Spark built-ins:

- normalization is a linear min-max scale to ``bits``-bit integers (one
  O(k)-scalar agg — an index-build action, like IVF's centroid collect;
  at 100 TB swap in approxQuantile rank boundaries if the columns are
  heavily skewed);
- bit interleaving is a sum of shift/mask terms — pure codegen, no UDF;
- the write is ``repartitionByRange`` on the key (contiguous curve
  segments per file) + ``sortWithinPartitions`` (tight row groups inside
  each file).

Everything downstream is free: parquet writes min/max per row group, and
any engine's scan (including this repo's) prunes on them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZKEY = "__zkey"


def _normalized(col: str, mn: float, mx: float, bits: int) -> Column:
    """Min-max scale ``col`` to an integer in [0, 2^bits).

    ``floor`` (not round): half-way rounding differs between engines
    (HALF_UP vs HALF_EVEN), and for a space-filling curve the bucket
    boundary choice is arbitrary — floor keeps the key bit-for-bit
    reproducible in any ANSI SQL engine, which the correctness oracle
    exploits."""
    top = (1 << bits) - 1
    if mx <= mn:  # constant column — every row maps to 0
        return F.lit(0).cast("long")
    scaled = (F.col(col).cast("double") - F.lit(float(mn))) / F.lit(
        float(mx - mn)
    ) * F.lit(float(top))
    return F.least(F.greatest(F.floor(scaled), F.lit(0)), F.lit(top))


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """The interleaved-bits sort key for ``cols`` as a codegen expression.

    Runs one min/max aggregate over ``df`` (k scalars to the driver) to
    fix the normalization, then builds sum(((v_c >> i) & 1) << (i*k + c))
    — ``bits × k`` shift/mask terms, entirely JVM-side."""
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_key needs at least one column")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).first()
    key = F.lit(0).cast("long")
    for c_idx, c in enumerate(cols):
        v = _normalized(c, stats[f"mn_{c}"], stats[f"mx_{c}"], bits)
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(v, i).bitwiseAND(F.lit(1)), i * k + c_idx
            )
    return key


def hilbert_keyed(
    df: DataFrame, cols: list[str], bits: int = 8, out: str = "hkey"
) -> DataFrame:
    """``df`` plus the 2-D Hilbert-curve sort key of ``cols`` — the
    locality-tighter sibling of ``zorder_key``.

    The Z-curve's bit interleave has long diagonal jumps (adjacent keys
    can be far apart in space), so file bounding boxes overlap more than
    they must; the Hilbert curve visits each cell of the 2^bits × 2^bits
    grid exactly once with every step at grid distance 1, which is the
    best known clustering for multi-dim data skipping (Faloutsos &
    Roseman, PODS 1989 — and why lakehouse OPTIMIZE offers it beside
    Z-order). Same min-max floor normalization as the Z-key; the curve
    index is the classic per-level quadrant + rotate fold, unrolled to
    ``bits`` chained PROJECTIONS (one select per level keeps the
    expression tree linear — a single nested Column would double per
    level), all LEAST/GREATEST/CASE/shift/mask codegen, no UDF. Each
    level's coordinates are masked to [0, s) before the reflection, so
    no intermediate is ever negative and any ANSI engine replays the
    key bit-for-bit (the registry oracle does, via the identical CTE
    chain from ``hilbert_oracle_sql``)."""
    if len(cols) != 2:
        raise ValueError("hilbert_keyed is defined for exactly 2 columns")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).first()
    base = [c for c in df.columns]
    cur = df.select(
        "*",
        _normalized(cols[0], stats[f"mn_{cols[0]}"], stats[f"mx_{cols[0]}"], bits)
        .cast("long")
        .alias("__hx"),
        _normalized(cols[1], stats[f"mn_{cols[1]}"], stats[f"mx_{cols[1]}"], bits)
        .cast("long")
        .alias("__hy"),
        F.lit(0).cast("long").alias("__hd"),
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        x, y, d = F.col("__hx"), F.col("__hy"), F.col("__hd")
        rx = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, i).bitwiseAND(F.lit(1))
        # quadrant order 00→0, 01→1, 11→2, 10→3 (== (3·rx) XOR ry,
        # spelled as a CASE so the oracle twin is engine-neutral)
        quad = (
            F.when((rx == 0) & (ry == 0), 0)
            .when((rx == 0) & (ry == 1), 1)
            .when((rx == 1) & (ry == 1), 2)
            .otherwise(3)
        )
        xm = x.bitwiseAND(F.lit(s - 1))
        ym = y.bitwiseAND(F.lit(s - 1))
        nx = (
            F.when(ry == 1, xm)
            .when(rx == 1, F.lit(s - 1) - ym)
            .otherwise(ym)
        )
        ny = (
            F.when(ry == 1, ym)
            .when(rx == 1, F.lit(s - 1) - xm)
            .otherwise(xm)
        )
        cur = cur.select(
            *base,
            nx.alias("__hx"),
            ny.alias("__hy"),
            (d + F.lit(s * s) * quad.cast("long")).alias("__hd"),
        )
    return cur.select(*base, F.col("__hd").alias(out))


def hilbert_oracle_sql(
    table: str, key: str, cols: list[str], bits: int = 8
) -> str:
    """The DuckDB twin of ``hilbert_keyed`` — the identical normalize +
    per-level quadrant/rotate fold as a chain of ``bits`` CTEs."""
    c0, c1 = cols
    top = (1 << bits) - 1
    # CASE guard mirrors the Spark side's _normalized mx<=mn → 0 branch
    # (round-11 ADVICE): a constant column would otherwise divide by
    # zero and yield inf/NaN in DuckDB where Spark emits bucket 0.
    norm = ", ".join(
        f"CASE WHEN mx{i} <= mn{i} THEN 0 ELSE "
        f"LEAST(GREATEST(CAST(FLOOR((CAST({c} AS DOUBLE) - mn{i})"
        f" / (mx{i} - mn{i}) * {top}) AS BIGINT), 0), {top}) END AS {v}"
        for i, (c, v) in enumerate(((c0, "hx"), (c1, "hy")))
    )
    levels = []
    prev = "v0"
    for lvl, i in enumerate(range(bits - 1, -1, -1)):
        s = 1 << i
        cte = f"""
    v{lvl + 1} AS (
      SELECT {key},
        CASE WHEN ((hy >> {i}) & 1) = 1 THEN hx & {s - 1}
             WHEN ((hx >> {i}) & 1) = 1 THEN {s - 1} - (hy & {s - 1})
             ELSE hy & {s - 1} END AS hx,
        CASE WHEN ((hy >> {i}) & 1) = 1 THEN hy & {s - 1}
             WHEN ((hx >> {i}) & 1) = 1 THEN {s - 1} - (hx & {s - 1})
             ELSE hx & {s - 1} END AS hy,
        hd + {s * s} * (CASE WHEN ((hx >> {i}) & 1) = 0
                                  AND ((hy >> {i}) & 1) = 0 THEN 0
                             WHEN ((hx >> {i}) & 1) = 0 THEN 1
                             WHEN ((hy >> {i}) & 1) = 1 THEN 2
                             ELSE 3 END) AS hd
      FROM {prev}
    )"""
        levels.append(cte)
        prev = f"v{lvl + 1}"
    return f"""
    WITH st AS (
      SELECT min(CAST({c0} AS DOUBLE)) AS mn0, max(CAST({c0} AS DOUBLE)) AS mx0,
             min(CAST({c1} AS DOUBLE)) AS mn1, max(CAST({c1} AS DOUBLE)) AS mx1
      FROM {table}
    ),
    v0 AS (SELECT {key}, {norm}, CAST(0 AS BIGINT) AS hd FROM {table}, st),
    {",".join(levels)}
    SELECT {key}, hd AS hkey FROM {prev}
    """


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` to ``path`` laid out along the Z-curve of ``cols``.

    ``repartitionByRange`` on the key gives each output file a contiguous
    curve segment (a compact region of the k-dim space); the within-
    partition sort keeps row groups tight inside the file. The key column
    is dropped before the write — the layout, not the key, is the
    product."""
    (
        df.withColumn(ZKEY, zorder_key(df, cols, bits))
        .repartitionByRange(n_files, F.col(ZKEY))
        .sortWithinPartitions(ZKEY)
        .drop(ZKEY)
        .write.mode("overwrite")
        .parquet(path)
    )
