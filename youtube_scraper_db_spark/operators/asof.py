"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks
natively, built as a composition of existing relational ops.

For every left row ``(key, t)``, attach the payload of the LATEST right
row with the same key and ``right_ts <= t`` (inclusive). The standard
uses: latest price before a trade, latest profile before an event,
latest order before a support ticket.

Scale design — the union + carry-forward-window formulation:

1. tag both sides and union them (right rows sort BEFORE left rows at
   equal timestamps, making the match inclusive);
2. one window per key ordered by ``(ts, side)`` with
   ``last(payload, ignorenulls=True)`` over a rows-frame carries each
   right payload forward to every later left row;
3. filter back to the left rows.

Cost: ONE shuffle of ``|left| + |right|`` rows on the key — no
range-explode, no per-key driver loop, no O(|left| × |right|) pair
stage. Skewed keys degrade exactly like any windowed agg and are
handled the same way (salt or AQE). An equivalent range-join +
max-aggregate needs two shuffles and materializes every candidate
match; a broadcast variant only works when the right side is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: all left columns + ``payload_cols`` from the
    matched right row (NULLs where none exists).

    ``direction="backward"`` (default): latest right row at-or-before
    each left timestamp — the point-in-time-lookup everybody means by
    "as-of". ``direction="forward"``: EARLIEST right row at-or-after —
    the next-scheduled-event lookup (next maintenance window, next
    order after a complaint). Same single-shuffle formulation either
    way; only the side ordering at equal timestamps and the carry
    frame flip: backward sorts right rows first and carries the last
    non-null payload forward, forward sorts left rows first and takes
    the first non-null payload from the current row onward.

    ``right`` must be unique per ``(key, right_ts)`` — with duplicates
    the carried payload would depend on partition-internal order.
    Pre-aggregate the right side to enforce this (the registry query
    does); uniqueness keeps the operator deterministic without paying
    for a global sort."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    backward = direction == "backward"
    left_side = 1 if backward else 0
    left_cols = [c for c in left.columns]
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(left_side).alias("_side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1 - left_side).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    u = l_tagged.unionByName(r_tagged)
    base = Window.partitionBy("_k").orderBy("_t", "_side")
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first
    carried = u.select(
        "_side",
        *left_cols,
        *[
            pick(f"_p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_side") == left_side).drop("_side")
