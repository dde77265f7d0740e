"""Property suite for the GIF LZW codec (llm/multimodal.py) — the
round-4 width-schedule bug showed roundtrip symmetry alone can hide
encoder/decoder pair bugs only at specific boundary lengths, so beyond
the pinned spec bitstream this drives arbitrary inputs through the
pair: any symbol sequence, any legal min-code-size, including the
degenerate empty and single-symbol streams and runs that trigger the
KwKwK case."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from youtube_scraper_db_spark.llm import multimodal as M


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=2, max_value=8).flatmap(
        lambda mcs: st.tuples(
            st.just(mcs),
            st.lists(
                st.integers(0, (1 << mcs) - 1), min_size=0, max_size=400
            ),
        )
    )
)
def test_lzw_roundtrip_arbitrary(case):
    mcs, seq = case
    arr = np.asarray(seq, dtype=np.uint8).reshape(1, -1)
    out = M._lzw_decode(M._lzw_encode(arr, mcs), mcs, len(seq))
    assert out is not None and out.tolist() == seq


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=40), st.integers(min_value=2, max_value=4))
def test_lzw_single_symbol_runs(n, mcs):
    """All-same-symbol streams exercise KwKwK immediately and at every
    dictionary growth point."""
    seq = np.zeros((1, n), dtype=np.uint8)
    out = M._lzw_decode(M._lzw_encode(seq, mcs), mcs, n)
    assert out is not None and np.array_equal(out, seq.ravel())


def test_lzw_empty_stream():
    out = M._lzw_decode(M._lzw_encode(np.zeros((1, 0), np.uint8), 4), 4, 0)
    assert out is not None and out.size == 0
