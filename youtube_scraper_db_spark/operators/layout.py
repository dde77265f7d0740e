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
