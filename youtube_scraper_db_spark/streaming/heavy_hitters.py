"""Streaming heavy hitters — the Misra-Gries candidate summary held as
GROUP STATE across micro-batches (the streaming twin of
operators/heavy_hitters.py, completing the bounded-state streaming
family next to the HLL/CMS/Bloom/histogram sketches).

The batch form folds each PARTITION through a (k-1)-slot summary; the
streaming form folds each HASH BUCKET's substream through the same
summary held in ``applyInPandasWithState`` group state, so state is
O(buckets × k) FOREVER while exact streaming frequency counting grows
O(vocabulary) — the entire reason a summary exists on an infinite
stream.

Correctness shape (same pigeonhole as the batch form, sharpened by the
bucketing): hashing on the word itself routes ALL occurrences of a word
to one bucket, so a global heavy hitter with count > N/k has count
> N_bucket/k in its own bucket's substream and survives that bucket's
summary. The state fold across micro-batches is EXACTLY the batch fold
over the concatenated stream (same vectorized add-then-trim rule), so
the final-batch candidate set is the batch candidate set; earlier
batches' emissions only ADD candidates (update-mode union), keeping the
drained set a SUPERSET of the true heavy hitters. The exact recount
(shared with the batch operator) then decides — the result is exact,
and the streaming gate shares the batch gate's oracle verbatim.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (words, counts) — the MG summary's slots, carried across batches.
_STATE_SCHEMA = "words array<string>, counts array<long>"


def mg_candidate_stream(
    words: DataFrame, col: str = "w", k: int = 32, buckets: int = 32
) -> DataFrame:
    """Per-bucket Misra-Gries summaries over a streaming word column:
    emits each bucket's CURRENT candidate words every micro-batch
    (update mode — the drained union is a candidate superset). State
    per bucket is the (k-1)-slot summary, nothing else."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ws, cs = state.get
            counters = pd.Series(list(cs), index=list(ws), dtype="int64")
        else:
            counters = pd.Series(dtype="int64")
        for pdf in pdfs:
            # the SAME vectorized add-then-trim rule as the batch
            # _mg_summary (operators/heavy_hitters.py) — the state fold
            # across batches equals the batch fold over the whole
            # stream. The add stays in int64 END TO END: Series.add
            # with fill_value upcasts to float64 on index union, so a
            # counter past 2^53 would lose precision DURING the add
            # (before any astype could save it) and silently stop
            # incrementing (x + 1.0 == x), breaking the
            # candidate-superset bound on exactly the forever-running
            # stream this state exists for. Reindexing both sides to
            # the union index with an int64 fill keeps every
            # intermediate an int64.
            vc = pdf[col].value_counts().astype("int64")
            idx = counters.index.union(vc.index)
            counters = counters.reindex(idx, fill_value=0) + vc.reindex(
                idx, fill_value=0
            )
            if len(counters) > k - 1:
                kth = counters.nlargest(k).iloc[-1]
                counters = counters - kth
                counters = counters[counters > 0]
        state.update(
            (
                [str(w) for w in counters.index],
                [int(c) for c in counters.to_numpy()],
            )
        )
        yield pd.DataFrame({col: counters.index.astype(str)})

    bucketed = words.select(
        F.col(col), F.pmod(F.xxhash64(F.col(col)), F.lit(buckets)).alias("__b")
    )
    return bucketed.groupBy("__b").applyInPandasWithState(
        fn,
        outputStructType=f"{col} string",
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
