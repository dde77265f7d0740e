"""Deterministic hash-based sampling — splits, stratified rates, and
epoch-weighted corpus mixing.

``rand()``-based sampling is useless in a data pipeline: re-running the
job samples a *different* subset, so downstream caches, resumed jobs, and
train/test membership all drift. Everything here instead derives a
uniform [0,1) draw from ``md5(id)`` — a pure projection, so it needs no
shuffle, no seed plumbing, is stable across runs/engines/partitionings,
and any row's fate is auditable from its id alone.

The draw is compared as a *hex string prefix*: ``substring(md5(id),1,8)``
is uniform over 32 bits, and lexicographic order on fixed-width lowercase
hex equals numeric order — so ``hex8 < threshold_hex(rate)`` samples at
``rate`` with zero integer parsing, in any engine with ``md5`` (Spark and
DuckDB produce identical digests, which is what makes these operators
oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hex8(id_col: Column | str) -> Column:
    """First 8 hex chars of md5(id) — a uniform 32-bit draw as a string."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string")), 1, 8)


def threshold_hex(rate: float) -> str:
    """Hex-string threshold t with P[hex8 < t] = rate. rate >= 1 maps to
    ``'g0000000'`` which is > every hex digest (hex chars stop at 'f'),
    i.e. keep-everything — exact, unlike ``'ffffffff'``."""
    if rate >= 1.0:
        return "g0000000"
    if rate <= 0.0:
        return "00000000"
    return format(int(rate * 2**32), "08x")


def deterministic_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Uniform sample at ``rate``, stable across runs and partitionings."""
    return df.where(hex8(id_col) < threshold_hex(rate))


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]],
    out_col: str = "split",
) -> DataFrame:
    """Disjoint split assignment (e.g. train/valid/test) by cumulative
    hash ranges. ``splits`` are (name, fraction) with fractions summing to
    1; the last split absorbs the remainder exactly."""
    h = hex8(id_col)
    expr = None
    acc = 0.0
    for name, frac in splits[:-1]:
        acc += frac
        cond = h < F.lit(threshold_hex(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-stratum sampling rates (downsample dominant languages, cap a
    noisy source, …). The per-row threshold is a CASE over ``strata_col``
    — still a pure projection, no shuffle, no join."""
    expr = None
    for k, r in rates.items():
        cond = F.col(strata_col) == k
        t = F.lit(threshold_hex(r))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thr = F.lit(threshold_hex(default_rate)) if expr is None else expr.otherwise(
        threshold_hex(default_rate)
    )
    return df.where(hex8(id_col) < thr)


def mix_epochs(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    factors: dict[str, float],
    default_factor: float = 1.0,
) -> DataFrame:
    """Epoch-weighted corpus mixing: repeat each row ``factor`` times,
    where fractional factors are resolved per row by the hash draw (factor
    2.5 → every row twice, half the rows — always the same half — a third
    time). Emits an ``epoch`` column (1-based); factor 0 drops the
    stratum. This is the standard training-mixture op (upweight curated
    sources, downweight crawl) as a single explode — no union-per-epoch
    plan blowup."""
    whole_expr, frac_expr = None, None
    for k, f in factors.items():
        cond = F.col(strata_col) == k
        w, fr = F.lit(int(f)), F.lit(threshold_hex(f - int(f)))
        whole_expr = F.when(cond, w) if whole_expr is None else whole_expr.when(cond, w)
        frac_expr = F.when(cond, fr) if frac_expr is None else frac_expr.when(cond, fr)
    dw, dfr = int(default_factor), threshold_hex(default_factor - int(default_factor))
    whole = F.lit(dw) if whole_expr is None else whole_expr.otherwise(dw)
    frac_thr = F.lit(dfr) if frac_expr is None else frac_expr.otherwise(dfr)
    n = whole + F.when(hex8(id_col) < frac_thr, 1).otherwise(0)
    epochs = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("epoch", F.explode(epochs))


def ares_priority(id_col: Column | str, weight_col: Column | str) -> Column:
    """Efraimidis–Spirakis A-Res priority: u^(1/w) with u ∈ (0,1] drawn
    from md5(id). Rounded to 6 dp so cross-engine libm last-ulp
    differences cannot reorder rows (ties broken by id downstream).
    Non-positive weights score 0 — the A-Res convention (never sampled
    ahead of any positive-weight row); without the guard, ANSI-mode
    Spark throws DIVIDE_BY_ZERO on a zero-weight row (e.g. an empty
    document weighted by length)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (F.conv(hex8(id_col), 16, 10).cast("double") + 1) / F.lit(4294967296.0)
    return F.when(w <= 0, F.lit(0.0)).otherwise(
        F.round(F.pow(u, 1.0 / w), 6)
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, n: int
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of size ``n``
    (global top-n by A-Res priority — plans as TakeOrderedAndProject:
    O(n) state per partition, no global sort, rerun-stable like every
    sampler here). Adds a ``priority`` column."""
    return (
        df.withColumn("priority", ares_priority(id_col, weight_col))
        .orderBy(F.desc("priority"), F.asc(id_col))
        .limit(n)
    )


def weighted_sample_grouped(
    df: DataFrame, group_col: str, id_col: str, weight_col: str, n: int
) -> DataFrame:
    """Deterministic weighted sample of size ``n`` PER GROUP — the
    stratified member of the A-Res family (training-mixture sampling:
    "k docs per source, weighted by quality/length"). Same priority
    function as ``weighted_sample`` (md5-derived u^(1/w), 6 dp, id
    tiebreak), ranked inside each group by a partitioned window: one
    shuffle on the group key, per-group O(n) survivors, no global sort.
    Mergeable per group for free — the priority is a pure per-row
    function, so per-shard per-group top-n tables re-rank exactly like
    ``weighted_sample_merge``. Adds ``priority`` and keeps ``rk`` out
    of the result."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("priority"), F.asc(id_col))
    )
    return (
        df.withColumn("priority", ares_priority(id_col, weight_col))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
        .drop("rk")
    )
