"""Exact heavy hitters in two bounded-memory passes — Misra-Gries
candidate generation per partition, then an exact recount of candidates
only.

The problem at 100 TB: "which words occur in more than 1/k of all token
positions" via a full groupBy shuffles the ENTIRE vocabulary (billions
of rare keys) to answer a question about at most k-1 keys. The classic
fix (Misra-Gries 1982, the deterministic frequent-items summary):

1. Each partition streams its items through a k-slot counter summary —
   O(k) memory, one pass, no shuffle. Guarantee: any item whose count
   in that partition exceeds N_p/k survives the partition's summary.
   By pigeonhole, a GLOBAL heavy hitter (count > N/k = Σ N_p/k) must
   exceed N_p/k in at least one partition, so the union of per-partition
   candidate sets is a SUPERSET of the true heavy hitters — at most
   (k-1) × partitions candidates, tiny.
2. Exact counts for candidates only: semi-join the corpus against the
   broadcast candidate set and count — the shuffle now carries only
   candidate keys.

Result is EXACT (the summary only generates candidates; the recount
decides), with the full-vocabulary exchange replaced by a broadcast +
a candidates-only aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_summary(items: Iterator[pd.DataFrame], col: str, k: int) -> Iterator[pd.DataFrame]:
    """Fold all Arrow batches of one partition through a (k-1)-slot
    Misra-Gries summary, VECTORIZED per batch (the mergeable-summaries
    batch rule — Agarwal et al. 2012: add the batch's value counts,
    then subtract the k-th largest counter from all and drop the
    non-positive — preserves the N_p/k error bound, so the candidate
    superset guarantee holds). Per batch this is a value_counts + an
    nlargest over at most |summary| + |batch vocab| keys, all C-speed;
    no per-token Python."""
    counters = pd.Series(dtype="int64")
    for pdf in items:
        vc = pdf[col].value_counts()
        # astype: Series.add upcasts to float64 on index union; int64
        # keeps the counters exact (here bounded by one partition's
        # rows, but the streaming twin accumulates forever — one rule)
        counters = counters.add(vc, fill_value=0).astype("int64")
        if len(counters) > k - 1:
            kth = counters.nlargest(k).iloc[-1]
            counters = counters - kth
            counters = counters[counters > 0]
    yield pd.DataFrame({col: counters.index.astype(str)})


def recount_candidates(
    src: DataFrame, cands: DataFrame, col: str, k: int
) -> DataFrame:
    """Stage 2 shared by the batch and streaming forms: exact counts
    for the (broadcast) candidate set only, integer threshold
    cnt·k > n_total. As long as ``cands`` is a SUPERSET of the true
    heavy hitters, the output is exact."""
    counted = (
        src.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    total = src.agg(F.count("*").alias("n_total"))
    return (
        counted.crossJoin(total)
        .filter(F.col("cnt") * k > F.col("n_total"))
        .select(col, F.col("cnt").cast("long").alias("cnt"),
                F.col("n_total").cast("long").alias("n_total"))
    )


def exact_heavy_hitters(
    items: DataFrame, col: str, k: int = 16
) -> DataFrame:
    """All values of ``col`` occurring in MORE than 1/``k`` of all rows,
    with exact counts. Columns: (col, cnt, n_total).

    The threshold compare is integer (cnt * k > n_total) — no division,
    no float, engine-exact."""
    src = items.select(col)
    cands = (
        src.mapInPandas(
            lambda it: _mg_summary(it, col, k),
            schema=f"{col} string",
        )
        .distinct()
    )
    return recount_candidates(src, cands, col, k)
