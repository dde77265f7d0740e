"""Property-based invariants for segment-level dedup (hypothesis): the
first-occurrence-in-(doc_id, pos)-order policy is deterministic, so the
exact expected output is computable in plain Python for ANY corpus —
counts, survivor multiset, and the reassembled text itself."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from youtube_scraper_db_spark.llm import dedup as D

WORDS = ["a", "b", "c", "d"]
SEG = 3

corpora = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=25),
    min_size=1,
    max_size=8,
)


def _expected(token_lists):
    seen = set()
    exp = {}
    for i, toks in enumerate(token_lists):
        segs = [
            " ".join(toks[j : j + SEG]) for j in range(0, len(toks), SEG)
        ]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        if segs:
            exp[i] = (len(segs), len(kept), " ".join(kept))
    return exp


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpora)
def test_segment_dedup_matches_reference_policy(spark, token_lists):
    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_segments, r.kept_segments, r.dedup_text)
        for r in D.segment_dedup(df, seg_tokens=SEG).collect()
    }
    assert got == _expected(token_lists)
