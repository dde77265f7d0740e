"""BPE train/apply — semantics pinned three ways: an INDEPENDENT
reference trainer written here (different data structures, its own
argmax), driver-vs-distributed path agreement, and expression-vs-Arrow
apply agreement, plus the classic textbook corpus by hand."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from youtube_scraper_db_spark.llm import bpe as B


def _ref_train(word_counts, n, distinct_pairs=False):
    """Reference BPE trainer: words kept as lists, pairs recounted from
    scratch each round, argmax via explicit sort — structurally unlike
    the library's dict-fold."""
    words = [(list(w), c) for w, c in sorted(word_counts.items())]
    out = []
    for _ in range(n):
        tally = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                if distinct_pairs and p[0] == p[1]:
                    continue
                tally[p] = tally.get(p, 0) + c
        if not tally:
            break
        best = sorted(tally.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (l, r), cnt = best
        out.append((l, r, cnt))
        nwords = []
        for syms, c in words:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            nwords.append((res, c))
        words = nwords
    return out


def test_merge_word_semantics():
    assert B.merge_word(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert B.merge_word(tuple("aaaaa"), "a", "a") == ("aa", "aa", "a")
    assert B.merge_word(tuple("banana"), "a", "n") == ("b", "an", "an", "a")
    assert B.merge_word(tuple("abab"), "a", "b") == ("ab", "ab")
    assert B.merge_word(("x",), "a", "b") == ("x",)
    assert B.merge_word((), "a", "b") == ()


def test_textbook_corpus_merges(spark):
    """low×5 lower×2 newest×6 widest×3: the canonical example — first
    merges must be (e,s):9, (es,t):9, (l,o):7, (lo,w):7."""
    docs = spark.createDataFrame(
        [(0, "low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3)],
        "doc_id long, text string",
    )
    merges = B.bpe_train(docs, "text", 4)
    assert merges == [
        ("e", "s", 9), ("es", "t", 9), ("l", "o", 7), ("lo", "w", 7)
    ]


@settings(max_examples=15, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcde", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    ),
    st.booleans(),
)
def test_driver_trainer_matches_independent_reference(wc, distinct):
    """Same-symbol pairs allowed AND the distinct-pair gate variant —
    small alphabet forces heavy pair collisions and ties, so the
    deterministic tie-break is exercised hard."""
    assert B._train_driver(dict(wc), 6, distinct) == _ref_train(wc, 6, distinct)


def test_distributed_path_matches_driver(spark):
    docs = spark.createDataFrame(
        [
            (0, "table table scan value value value row"),
            (1, "scan scan table fastt fastt seem seem seem"),
            (2, "banana banana aaaa abab row row row value"),
        ],
        "doc_id long, text string",
    )
    for distinct in (False, True):
        d = B.bpe_train(docs, "text", 6, distinct_pairs=distinct)
        x = B.bpe_train(
            docs, "text", 6, distinct_pairs=distinct, driver_max_vocab=0
        )
        assert d == x, (distinct, d, x)


def test_apply_expr_matches_kernel_and_detokenizes(spark):
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    vocabulary = ["table", "scan", "value", "banana", "abab", "aaaa", "ro", "w"]
    texts = [
        " ".join(rng.choice(vocabulary, rng.integers(0, 30)).tolist())
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = [m[:2] for m in B.bpe_train(docs, "text", 8)]

    kern = {
        r.id: r.tokens
        for r in B.bpe_apply(docs, "doc_id", "text", merges).collect()
    }
    from youtube_scraper_db_spark.llm import text as T

    expr = {
        r.doc_id: r.toks
        for r in docs.select(
            "doc_id",
            F.flatten(
                F.transform(
                    T.tokens("text"),
                    lambda w: B.bpe_apply_expr(w, merges),
                )
            ).alias("toks"),
        ).collect()
    }
    assert kern == expr
    # lossless: concatenating each word's tokens restores the text
    for i, text in enumerate(texts):
        assert "".join(kern[i]) == text.replace(" ", "")


def test_apply_sequential_equals_priority(spark):
    """Sequential-by-rank one-pass application must equal the
    priority-queue formulation (merge the best-ranked pair anywhere,
    repeat) — the equivalence the module docstring argues."""

    def priority_apply(word, merges):
        rank = {m: i for i, m in enumerate(merges)}
        syms = list(word)
        while True:
            best, bi = None, None
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                r = rank.get(p)
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                return tuple(syms)
            l, r_ = merges[best]
            # merge ALL non-overlapping occurrences of this pair,
            # leftmost first (the batch form used by fast tokenizers)
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r_:
                    out.append(l + r_)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out

    rng = np.random.default_rng(11)
    merges = [("a", "b"), ("c", "a"), ("ab", "c"), ("b", "a"), ("ab", "ab")]
    for _ in range(300):
        word = "".join(rng.choice(list("abc"), rng.integers(1, 14)))
        seq = tuple(word)
        for l, r in merges:
            seq = B.merge_word(seq, l, r)
        assert seq == priority_apply(word, merges), word
