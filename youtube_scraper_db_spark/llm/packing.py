"""Sequence packing — batch documents into fixed-capacity context
windows (the pre-training "packing" step that turns ragged documents
into dense max-length training sequences).

Bin packing is inherently sequential/stateful, so it cannot be a
DataFrame expression — but GLOBAL packing is also unnecessary: packing
loss is a local property. The scalable shape is **bucketed FFD**:

1. hash each doc into one of B buckets (deterministic md5 draw, same as
   llm/sampling.py — rerunning the job yields identical bins);
2. within each bucket, first-fit-decreasing via ``applyInPandas`` — an
   Arrow-batched, per-group Python kernel, the documented escape hatch
   for genuinely non-relational logic;
3. bin ids are (bucket, local bin) pairs, so buckets never coordinate.

B scales with the cluster (each bucket is an independent task); FFD
within a bucket guarantees ≥ (8/9)·OPT bin count asymptotically, and
cross-bucket loss stays small because every bucket sees the same length
distribution. Docs longer than ``capacity`` are capped to exactly one
full bin each (real pipelines truncate or split them upstream).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hex8


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    capacity: int,
    num_buckets: int = 32,
) -> DataFrame:
    """Assign each row a ``bin_id`` (string ``"<bucket>_<n>"``) such that
    the sum of ``min(len, capacity)`` within a bin never exceeds
    ``capacity``. Deterministic: bucket from md5(id), FFD order is
    (capped length desc, id asc)."""
    bucket = (
        F.conv(F.substring(hex8(id_col), 1, 6), 16, 10).cast("long")
        % num_buckets
    ).cast("int")
    capped = F.least(F.col(len_col).cast("long"), F.lit(capacity))
    src = df.select(
        F.col(id_col).alias("_id"),
        capped.alias("_len"),
        bucket.alias("_bucket"),
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_len", "_id"], ascending=[False, True])
        b = int(pdf["_bucket"].iloc[0])
        remaining: list[int] = []  # free space per local bin
        assigned = []
        for ln in pdf["_len"]:
            ln = int(ln)
            for i, free in enumerate(remaining):
                if free >= ln:
                    remaining[i] = free - ln
                    assigned.append(i)
                    break
            else:
                assigned.append(len(remaining))
                remaining.append(capacity - ln)
        pdf = pdf.assign(bin_id=[f"{b}_{i}" for i in assigned])
        return pdf[["_id", "_len", "bin_id"]]

    out = src.groupBy("_bucket").applyInPandas(
        ffd, schema="_id long, _len long, bin_id string"
    )
    return out.select(
        F.col("_id").alias(id_col),
        F.col("_len").alias("packed_len"),
        "bin_id",
    )
