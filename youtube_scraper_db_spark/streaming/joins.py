"""Stream-stream interval join — correlate two live event streams
(e.g. impressions ⋈ conversions) with bounded state.

An unbounded join of two streams is impossible without a bound on how
long a row can wait for its partner; the watermark + time-range
condition IS that bound. Spark keeps each side's rows in join state
only until the other side's watermark passes the end of their match
window, so state is O(rate × window), independent of stream lifetime —
the only formulation of a stream-stream join that survives at
production scale.

Batch twin: the same join condition on static frames (used by the
agreement test) — semantics identical, minus the state eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` on ``on`` where the right event
    lands in ``[left.ts, left.ts + within]``.

    ``how="inner"`` (default) emits matches as they form.
    ``how="left_outer"`` additionally emits a null-extended row for
    every left event that finds NO partner — but only once that can be
    KNOWN: when the right watermark passes the end of the left row's
    match window, the state evicts and the null row emits. A left row
    near the end of input whose window the final watermark never
    covers emits nothing — the gate in the registry closes that with a
    far-future anchor on the right stream so every real left's window
    is decided before the replay drains.

    Both inputs must carry an event-time ``ts`` column; all columns are
    re-prefixed so the output schema is collision-free. Works unchanged
    on static frames (no watermark is applied there), which is what the
    batch/stream agreement test exploits.
    """
    lp = left.select(
        [F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
    )
    rp = right.select(
        [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    if lp.isStreaming:
        lp = lp.withWatermark(f"{left_prefix}ts", watermark)
    if rp.isStreaming:
        rp = rp.withWatermark(f"{right_prefix}ts", watermark)
    lts, rts = F.col(f"{left_prefix}ts"), F.col(f"{right_prefix}ts")
    cond = (
        (F.col(f"{left_prefix}{on}") == F.col(f"{right_prefix}{on}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {within}"))
    )
    return lp.join(rp, cond, how)
