"""Window-shaped computations (SURVEY.md §2.5 W1-W3).

The reference does these with Python ``enumerate`` / ``MAX()+1`` /
``ORDER BY + list()``; here each is one window function. All three
partition by the group key, so they share a single hash shuffle on
``group_col`` — at scale, pre-partitioning the edge table by the same key
makes them shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_positions(
    df: DataFrame,
    group_col: str,
    order_col: str | Column,
    out_col: str = "position",
) -> DataFrame:
    """W1 — arrival-order position, 1-based (ref scrape_my_channel.py:456-461
    ``enumerate(video_urls, start=1)``)."""
    w = Window.partitionBy(group_col).orderBy(order_col)
    return df.withColumn(out_col, F.row_number().over(w).cast("long"))


def next_position(df: DataFrame, group_col: str, pos_col: str = "position") -> DataFrame:
    """W2 — ``MAX(position)+1`` within the group as a column
    (ref display.py:305-311); groups of all-NULL positions start at 1."""
    w = Window.partitionBy(group_col)
    return df.withColumn(
        "next_position", (F.coalesce(F.max(pos_col).over(w), F.lit(0)) + 1).cast("long")
    )


def ordered_collect(
    df: DataFrame,
    group_col: str,
    order_cols: str | Sequence[str],
    value_col: str,
    out_col: str = "items",
) -> DataFrame:
    """W3 — per-group list of ``value_col`` ordered by ``order_cols``
    (ref export_playlists.py:43-47 ``ORDER BY position`` then list).

    Implemented as ``sort_array(collect_list(struct(*order, value)))`` — one
    hash aggregate, no window, order defined inside the aggregate so it is
    shuffle-order-independent (deterministic at any parallelism). Callers
    should pass order columns forming a total order within the group, or
    the list order of tied rows is struct-comparison order over the
    remaining fields.
    """
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    fields = list(order_cols) + ([value_col] if value_col not in order_cols else [])
    packed = F.sort_array(F.collect_list(F.struct(*[F.col(c) for c in fields])))
    return df.groupBy(group_col).agg(
        F.transform(packed, lambda s: s[value_col]).alias(out_col)
    )
