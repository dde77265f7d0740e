"""Set-difference diff-sync (SURVEY.md §2.3 J8, §2.7 E1/E4).

The reference computes ``ids_to_add = yt − db`` and ``ids_to_remove =
db − yt`` with Python sets (ref main_scraper.py:148-152,
scrape_my_channel.py:182-187). Spark-first, each direction is one
``left_anti`` join; at 100 TB both sides shuffle on the key once and the
two anti-joins share that partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .merge import insert_if_absent, keyed_delete


def diff_keys(
    current: DataFrame, desired: DataFrame, keys: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """Return ``(to_add, to_remove)`` key sets.

    ``to_add``    = desired − current (ref main_scraper.py:151)
    ``to_remove`` = current − desired (ref main_scraper.py:152)
    """
    cur = current.select(*keys).distinct()
    des = desired.select(*keys).distinct()
    to_add = des.join(cur, on=list(keys), how="left_anti")
    to_remove = cur.join(des, on=list(keys), how="left_anti")
    return to_add, to_remove


def diff_keys_tagged(
    current: DataFrame, desired: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Single-DataFrame view of the diff: each key row tagged with
    ``change ∈ {'add','remove'}`` — convenient for audit logs and the
    correctness oracle."""
    to_add, to_remove = diff_keys(current, desired, keys)
    return to_add.withColumn("change", F.lit("add")).unionByName(
        to_remove.withColumn("change", F.lit("remove"))
    )


def sync_membership(
    edges: DataFrame,
    desired: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Full membership sync (ref main_scraper.py:144-179): apply the diff to
    the edge table — insert missing ``desired`` rows (S11), delete rows no
    longer desired (S12). Non-key columns of inserted rows come from
    ``desired`` (e.g. ``position``)."""
    to_add, to_remove = diff_keys(edges, desired, keys)
    added = insert_if_absent(edges, desired.join(to_add, on=list(keys), how="left_semi"), keys)
    return keyed_delete(added, to_remove, keys)
