"""Stream-static enrichment: join a live event stream against a slowly-
changing dimension table.

The streaming side stays append-only; the static side is a plain batch
DataFrame that Spark re-resolves per micro-batch (so a dimension rewrite
— e.g. an `Archive._commit` version swap — is picked up on the next
batch without restarting the query). The static side is explicitly
broadcast: a stream-static join must never shuffle the unbounded side on
the join key, because that re-partitions every micro-batch; with the dim
in every executor the stream partitions flow straight through.

This is the streaming twin of the registry's star-join queries
(`regional_revenue`): same broadcast-dimension stance, applied to
`readStream`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Join ``stream`` (streaming) to ``dim`` (static, broadcast).

    ``how`` is restricted to the stream-static-safe set: inner and
    left-outer keep the stream append-only with no watermark
    obligations; right/full would need the unbounded side as build
    input and are rejected by Spark anyway.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"enrich_stream: how={how!r} is not stream-static safe; "
            "use inner/left/left_semi/left_anti"
        )
    keys = [on] if isinstance(on, str) else list(on)
    return stream.join(F.broadcast(dim), keys, how)
