"""The sliding-calendar SPINE shared by every leaf-store window family
(KMV bottom-k sketches, HLL register tables, fixed-edge histograms,
Misra-Gries summaries — operators/kmv.py, sketches.py,
heavy_hitters.py): window ends derived from the leaf table and the
ends × leaves range join that assembles each ``width``-leaf window.

The architecture all four families share: raw events are touched ONCE
to build per-``grain`` leaf rows (O(leaves × k) / O(leaves × 2^p) /
O(leaves × bins) / O(leaves × (k-1)) — dim-bounded whatever the event
volume); every sliding question then range-joins the LEAF table, never
per-event data, so answering a new (grain, width) calendar costs one
dim-sized join. Window ends come from the leaf table itself — a grain
bucket with no leaf (all keys null, or no events) produces no window
end, the contract the family oracles mirror with their key-not-null
ends CTEs.

Factoring the spine here (r11 verdict item 6) makes a fifth family a
~20-line module and pins the cross-family agreement: KMV and HLL
leaves built from the SAME spine answer the SAME window set — gated by
``sliding_spine_consistency`` in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_materialized(df: DataFrame) -> bool:
    """True when the frame's analyzed plan is already a materialized
    scan (a ``localCheckpoint`` product) — re-checkpointing one only
    copies partitions."""
    name = df._jdf.queryExecution().analyzed().getClass().getSimpleName()
    return name == "LogicalRDD"


def window_ends(leaves: DataFrame, leaf_col: str = "leaf") -> DataFrame:
    """(wend): one window end per distinct leaf — every window the
    leaf store can answer ends at a leaf that exists."""
    return leaves.select(F.col(leaf_col).alias("wend")).distinct()


def window_leaves(
    leaves: DataFrame,
    width: int,
    grain: str = "day",
    leaf_col: str = "leaf",
    ends: DataFrame | None = None,
    broadcast_leaves: bool = True,
) -> DataFrame:
    """``ends`` × ``leaves`` range join: every leaf row tagged with each
    ``wend`` whose ``width``-leaf window contains it — the one join all
    window merges group over. ``leaves`` is dim-bounded by contract, so
    it broadcasts by default; pass ``broadcast_leaves=False`` for the
    larger per-leaf exact tables (|keys| × |leaves| rows) where a hash
    join is the right plan. Pass a precomputed ``ends`` to share one
    spine across several leaf tables (the consistency gate's device)."""
    if ends is None:
        # ends AND the join side both consume ``leaves`` — without the
        # cut the whole leaf build (a raw-event aggregate: the only
        # event-sized work in the family) runs twice per call, which is
        # exactly what the module docstring's "raw events are touched
        # ONCE" promises away. The leaf table is dim-bounded by
        # contract, so the materialization is cheap at every scale.
        # Callers that already materialized (the consistency gates) are
        # detected by the LogicalRDD root and not re-copied.
        if not _is_materialized(leaves):
            leaves = leaves.localCheckpoint(eager=True)
        ends = window_ends(leaves, leaf_col)
    # guard the join's column contract (r12 ADVICE): a leaf table
    # carrying 'wend', or an ends frame carrying extra columns shared
    # with the leaves, would make the range condition ambiguous
    if "wend" in leaves.columns:
        raise ValueError(
            "window_leaves: the leaf table must not carry a 'wend' column"
        )
    ends = ends.select("wend")
    lo = F.col("wend") - F.expr(f"INTERVAL {width - 1} {grain}")
    right = F.broadcast(leaves) if broadcast_leaves else leaves
    return ends.join(
        right, (F.col(leaf_col) >= lo) & (F.col(leaf_col) <= F.col("wend"))
    )
