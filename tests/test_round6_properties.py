"""Hypothesis property suites for the round-6 operators — the
no-Spark-session fast checks (pure Python semantics spines): portable
hash arithmetic, Viterbi segmentation, log-space EM, HTML structural
parser totality, integer resize."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from youtube_scraper_db_spark.llm import unigram as U
from youtube_scraper_db_spark.llm.html import _parse_blocks
from youtube_scraper_db_spark.llm.multimodal import resize_image
from youtube_scraper_db_spark.llm.text import py_tokens

P60 = 1 << 60


def _py_mix(h1: int, h2: int, i: int) -> int:
    """Reference: (h1 + i*h2) mod 2^60 in unbounded Python ints."""
    return (h1 + i * h2) % P60


@given(st.text(min_size=0, max_size=30), st.integers(0, 63))
@settings(max_examples=100, deadline=None)
def test_split_multiply_mix_equals_bigint_reference(s, i):
    """The 30-bit split-multiply form must equal plain (h1 + i*h2) mod
    2^60 for any md5-derived halves — the identity both engines rely
    on (every intermediate of the split form stays below 2^61)."""
    hx = hashlib.md5(s.encode()).hexdigest()
    h1, h2 = int(hx[:15], 16), int(hx[16:31], 16)
    split = (h1 + ((i * (h2 >> 30)) % (1 << 30)) * (1 << 30)
             + i * (h2 & ((1 << 30) - 1))) % P60
    assert split == _py_mix(h1, h2, i)
    # overflow-free claim: the pre-mod sum fits a signed 64-bit long
    pre = (h1 + ((i * (h2 >> 30)) % (1 << 30)) * (1 << 30)
           + i * (h2 & ((1 << 30) - 1)))
    assert pre < (1 << 63)


_PIECE = st.text(alphabet="abc", min_size=1, max_size=4)


@given(
    st.dictionaries(_PIECE, st.integers(-50, 50), min_size=0, max_size=8),
    st.text(alphabet="abcd", min_size=1, max_size=9),
)
@settings(max_examples=60, deadline=None)
def test_viterbi_property_matches_brute_force(scores, word):
    """Viterbi vs exhaustive enumeration under arbitrary small score
    tables (chars not in the table take UNK — every word segments)."""
    def all_segs(w):
        if not w:
            yield ()
            return
        for ln in range(1, min(4, len(w)) + 1):
            for rest in all_segs(w[ln:]):
                yield (w[:ln],) + rest

    best = None
    for seg in all_segs(word):
        tot, ok = 0, True
        for p in seg:
            s = scores.get(p)
            if s is None:
                if len(p) > 1:
                    ok = False
                    break
                s = U.UNK_SCORE
            tot += s
        if not ok:
            continue
        key = (-tot, len(seg), " ".join(seg))
        if best is None or key < best[0]:
            best = (key, seg)
    assert U.viterbi_segment(word, scores) == best[1]


@given(
    st.dictionaries(_PIECE, st.floats(-20, -0.1), min_size=1, max_size=8),
    st.text(alphabet="abcd", min_size=1, max_size=8),
)
@settings(max_examples=60, deadline=None)
def test_em_mass_conservation(logp, word):
    """Forward-backward expected piece counts sum to the expected
    SEGMENTATION LENGTH — in particular the total mass is ≥ 1 piece
    per ceil(len/4) and ≤ len, never lost to underflow."""
    got = U.em_expected_counts(word, logp, max_len=4)
    total = sum(got.values())
    n = len(word)
    assert -(-n // 4) - 1e-6 <= total <= n + 1e-6
    assert all(math.isfinite(v) for v in got.values())


@given(st.text(max_size=60))
@settings(max_examples=80, deadline=None)
def test_html_structural_parser_total(markup):
    """_parse_blocks never raises on arbitrary text and returns
    non-negative link counts bounded by block length."""
    blocks = _parse_blocks(markup)
    for text, link in blocks:
        assert text == " ".join(text.split())  # collapsed
        assert 0 <= link


@given(
    st.integers(1, 6), st.integers(1, 8),
    st.integers(1, 9), st.integers(1, 9),
    st.sampled_from(["nearest", "bilinear"]),
)
@settings(max_examples=60, deadline=None)
def test_resize_bounds_and_identity(h, w, oh, ow, method):
    """Resize output stays inside the input value range (both methods
    are convex combinations / selections), and identity dims copy."""
    rng = np.random.default_rng(h * 100 + w * 10 + oh + ow)
    a = rng.integers(0, 256, (h, w, 2), dtype=np.uint8)
    out = resize_image(a, oh, ow, method)
    assert out.shape == (oh, ow, 2)
    assert out.min() >= a.min() and out.max() <= a.max()
    assert (resize_image(a, h, w, method) == a).all()


@given(st.text(max_size=40))
@settings(max_examples=80, deadline=None)
def test_py_tokens_ascii_whitespace_only(text):
    """py_tokens splits on ASCII whitespace exactly: tokens re-join to
    the original minus ASCII whitespace, and NBSP stays inside tokens."""
    toks = py_tokens(text)
    import re

    assert "".join(toks) == re.sub(r"\s+", "", text, flags=re.ASCII)
    assert all(t for t in toks)
    # NBSP is NOT a separator (the Java-parity property str.split broke)
    if "\u00a0" in text:
        assert any("\u00a0" in t for t in toks)
