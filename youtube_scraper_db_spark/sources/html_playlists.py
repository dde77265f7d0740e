"""HTML playlist-id extraction (S4, E2; ref scrape_my_channel.py:375-400,
get_channel_playlists.py:64-91).

Given fetched channel-page HTML as rows, pull playlist ids with the
reference's three patterns (href, bare ``list=``, JSON ``"playlistId"``),
keep ids longer than 8 chars, and dedup preserving the first occurrence
across the pattern-priority order — the reference's ``seen``-set loop made
deterministic with an explicit (pattern, position) ordering.

The fetch itself (HTTP) is out-of-engine driver I/O (S5); this operator is
the dataflow half and is map-only until the final per-page dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import dedup_first_seen

#: ref scrape_my_channel.py:376-380, in priority order.
PATTERNS = (
    r'href="/playlist\?list=([A-Za-z0-9_-]+)"',
    r"list=([A-Za-z0-9_-]+)",
    r'"playlistId":"([A-Za-z0-9_-]+)"',
)


def extract_playlist_ids(df: DataFrame, html_col: str, key_col: str) -> DataFrame:
    """``(key, html)`` rows → ``(key, playlist_id)`` rows, one per unique id
    per key, first-seen order across patterns (ref dedup loop at
    scrape_my_channel.py:389-395), ids with ``len > 8`` only."""
    hits = F.flatten(
        F.array(
            *[
                F.regexp_extract_all(F.col(html_col), F.lit(p), 1)
                for p in PATTERNS
            ]
        )
    )
    exploded = df.select(
        F.col(key_col), F.posexplode(hits).alias("seen_seq", "playlist_id")
    ).filter(F.length("playlist_id") > 8)
    return dedup_first_seen(
        exploded, [key_col, "playlist_id"], [F.col("seen_seq")]
    ).select(key_col, "playlist_id")
