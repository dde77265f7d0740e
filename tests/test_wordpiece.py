"""WordPiece tokenizer: greedy-apply semantics, training selection rule
pinned against an independent brute-force reference, and driver ≡
distributed path equality."""

from __future__ import annotations

from fractions import Fraction

import pytest

from youtube_scraper_db_spark.llm import wordpiece as WP


# --- apply ------------------------------------------------------------

VOCAB = frozenset(
    ["t", "a", "b", "l", "e", "s", "c", "n", "tab", "ta", "sc"]
    + ["##" + c for c in "ablensc"]
    + ["##le", "##ble", "##an"]
)


def test_greedy_longest_match_prefers_longer_piece():
    # at i=0: "tab" (3) beats "ta" (2) and "t" (1)
    assert WP.wordpiece_word("table", VOCAB) == ("tab", "##le")


def test_greedy_is_not_optimal_search():
    # greedy takes "tab" + "##le"; it never reconsiders "ta" + "##ble"
    # even when both are available — position-by-position, not Viterbi
    assert "##ble" in VOCAB and WP.wordpiece_word("table", VOCAB) == (
        "tab",
        "##le",
    )


def test_unk_swallows_whole_word():
    # "z" has no piece at position 0 → the WHOLE word is [UNK]
    assert WP.wordpiece_word("zebra", VOCAB) == ("[UNK]",)
    # unmatchable mid-word position (no "##z") → [UNK] too
    assert WP.wordpiece_word("tazle", VOCAB) == ("[UNK]",)


def test_empty_word_is_empty_tuple():
    assert WP.wordpiece_word("", VOCAB) == ()


def test_continuation_prefix_only_after_first_piece():
    assert WP.wordpiece_word("scan", VOCAB) == ("sc", "##an")
    assert WP.wordpiece_word("a", VOCAB) == ("a",)


def test_max_piece_chars_caps_probe():
    v = frozenset(["abcdefg", "a", *("##" + c for c in "bcdefg")])
    # piece longer than the cap is never probed
    assert WP.wordpiece_word("abcdefg", v, max_piece_chars=3) == (
        "a", "##b", "##c", "##d", "##e", "##f", "##g",
    )
    assert WP.wordpiece_word("abcdefg", v, max_piece_chars=7) == ("abcdefg",)


def test_vocab_probe_bound_derivation():
    assert WP.vocab_probe_bound(VOCAB) == WP.MAX_PIECE_CHARS  # short vocab
    long_v = frozenset(["abcdefgh", "##defghij", "a"])
    assert WP.vocab_probe_bound(long_v) == 8  # raw chars, ## excluded
    assert WP.vocab_probe_bound(frozenset()) == WP.MAX_PIECE_CHARS


def test_apply_matches_trained_long_pieces(spark):
    """r07 ADVICE: train→apply composition must not lose pieces longer
    than MAX_PIECE_CHARS — the derived probe bound makes the trained
    9-char piece matchable."""
    rows = [(1, "установка установка установка")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = WP.wordpiece_train(df, "text", 8)
    vocab = set("у") | {"##" + c for c in "становка"}
    for l, r, *_ in merges:
        vocab.add(l + r[2:])
    assert any(
        (len(p) - 2 if p.startswith("##") else len(p)) > WP.MAX_PIECE_CHARS
        for p in vocab
    )
    got = {
        r["id"]: tuple(r["tokens"])
        for r in WP.wordpiece_apply(df, "doc_id", "text", vocab).collect()
    }
    # the whole 9-char word is a single trained piece after 8 merges
    assert got[1] == ("установка",) * 3


def test_apply_kernel_matches_spine(spark):
    rows = [(1, "table scan"), (2, "a zebra\ttable"), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: tuple(r["tokens"])
        for r in WP.wordpiece_apply(df, "doc_id", "text", VOCAB).collect()
    }
    assert got[1] == ("tab", "##le", "sc", "##an")
    assert got[2] == ("a", "[UNK]", "tab", "##le")
    assert got[3] == () and got[4] == ()


# --- train ------------------------------------------------------------

def _ref_train(wcounts: dict[str, int], num_merges: int, distinct: bool):
    """Independent brute-force WordPiece trainer using Fraction scores
    (a different argmax mechanism than the engine's cross-multiply)."""
    segs: dict[tuple, int] = {}
    for w, c in wcounts.items():
        key = (w[0],) + tuple("##" + ch for ch in w[1:])
        segs[key] = segs.get(key, 0) + c
    out = []
    for _ in range(num_merges):
        pc: dict[tuple, int] = {}
        sc: dict[str, int] = {}
        for seg, c in segs.items():
            for s in seg:
                sc[s] = sc.get(s, 0) + c
            for a, b in zip(seg, seg[1:]):
                if distinct and a == b:
                    continue
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        best = min(
            pc.items(),
            key=lambda kv: (
                -Fraction(kv[1], sc[kv[0][0]] * sc[kv[0][1]]),
                kv[0],
            ),
        )
        (l, r), n = best
        out.append((l, r, n, sc[l], sc[r]))
        nxt: dict[tuple, int] = {}
        for seg, c in segs.items():
            m = WP.merge_wp(seg, l, r)
            nxt[m] = nxt.get(m, 0) + c
        segs = nxt
    return out


WC = {
    "table": 10,
    "tables": 4,
    "tab": 6,
    "scan": 8,
    "scans": 3,
    "stable": 5,
    "an": 7,
    "a": 9,
}


@pytest.mark.parametrize("distinct", [False, True])
def test_driver_train_matches_independent_reference(distinct):
    got = WP._train_driver(WC, 6, distinct)
    ref = _ref_train(WC, 6, distinct)
    assert got == ref


def test_score_rule_is_ratio_not_raw_count():
    # pair (x, ##y) appears 5× but its operands are everywhere;
    # (q, ##z) appears 2× with rare operands → higher ratio wins
    wc = {"xy": 5, "xa": 50, "by": 50, "qz": 2}
    got = WP._train_driver(wc, 1, False)
    assert (got[0][0], got[0][1]) == ("q", "##z")


def test_exact_tie_breaks_lexicographically():
    # two pairs with IDENTICAL rational scores → lexicographic (l, r)
    wc = {"ab": 3, "cd": 3}
    got = WP._train_driver(wc, 1, False)
    assert (got[0][0], got[0][1]) == ("a", "##b")


def test_distributed_train_equals_driver(spark):
    rows = [(i, (t + " ") * 3) for i, t in enumerate(
        ["table scan table", "stable tables", "a an scan scans tab"]
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from youtube_scraper_db_spark.llm.bpe import word_vocab

    wc = {r["word"]: r["wcount"] for r in word_vocab(df, "text").collect()}
    want = WP._train_driver(wc, 5, True)
    got = WP._train_distributed(word_vocab(df, "text"), 5, True)
    assert got == want
    # and the public entry point picks the driver path here
    assert WP.wordpiece_train(df, "text", 5, distinct_pairs=True) == want


def test_merge_wp_strips_continuation_prefix():
    assert WP.merge_wp(("t", "##a", "##b"), "t", "##a") == ("ta", "##b")
    assert WP.merge_wp(("ta", "##b", "##a", "##b"), "##a", "##b") == (
        "ta", "##b", "##ab",
    )
    # leftmost non-overlapping: aaa with (##a,##a) merges once
    assert WP.merge_wp(("x", "##a", "##a", "##a"), "##a", "##a") == (
        "x", "##aa", "##a",
    )
