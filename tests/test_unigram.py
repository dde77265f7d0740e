"""Unigram-LM tokenizer: Viterbi semantics, hard/soft EM training,
driver vs distributed parity, apply kernel."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from youtube_scraper_db_spark.llm import unigram as U


def _all_segmentations(word: str, max_len: int):
    if word == "":
        yield ()
        return
    for ln in range(1, min(max_len, len(word)) + 1):
        head = word[:ln]
        for rest in _all_segmentations(word[ln:], max_len):
            yield (head,) + rest


def _brute_viterbi(word, scores, max_len=4, unk=U.UNK_SCORE):
    best = None
    for seg in _all_segmentations(word, max_len):
        ok = True
        tot = 0
        for p in seg:
            s = scores.get(p)
            if s is None:
                if len(p) > 1:
                    ok = False
                    break
                s = unk
            tot += s
        if not ok:
            continue
        key = (-tot, len(seg), " ".join(seg))
        if best is None or key < best[0]:
            best = (key, seg)
    return best[1]


SCORES = {
    "tab": 40, "le": 30, "ta": 20, "ble": 25, "sc": 15, "an": 35,
    "val": 28, "ue": 12, "ro": 18, "row": 22, "wind": 30, "ow": 14,
    "aa": 3, "aaa": 3,
}
for _ch in "abcdefghijklmnopqrstuvwxyz":
    SCORES[_ch] = 0


def test_viterbi_matches_brute_force():
    for w in (
        "table", "scan", "value", "row", "window", "spark", "a",
        "aaaa", "aaaaaaa", "tabletable", "scanscan", "batch", "zq",
    ):
        assert U.viterbi_segment(w, SCORES) == _brute_viterbi(w, SCORES), w


def test_viterbi_unknown_chars_stay_segmentable():
    assert U.viterbi_segment("x#1", SCORES) == ("x", "#", "1")


def test_quantlog_scores_formula():
    counts = {"a": 10, "ab": 5, "b": 0}
    got = U.quantlog_scores(counts)
    total = 15 + 3
    for p, c in counts.items():
        assert got[p] == math.floor(1e6 * math.log((c + 1) / total) + 0.5)


def test_seed_piece_counts_weighted_occurrences(spark):
    df = spark.createDataFrame(
        [(1, "aba aba"), (2, "aba")], "id long, text string"
    )
    # word vocab: aba x3. substrings (max_len 2): a(2/word), b, ab, ba
    got = {
        r["piece"]: r["freq"]
        for r in U.seed_piece_counts(df, "text", max_len=2, min_count=1).collect()
    }
    assert got == {"a": 6, "b": 3, "ab": 3, "ba": 3}


def test_train_viterbi_driver_vs_distributed(spark):
    df = spark.createDataFrame(
        [(i, "table scan value row window table scan") for i in range(6)],
        "id long, text string",
    )
    a = {
        (r["piece"], r["piece_count"])
        for r in U.unigram_train_viterbi(df, "text", iters=2).collect()
    }
    b = {
        (r["piece"], r["piece_count"])
        for r in U.unigram_train_viterbi(
            df, "text", iters=2, driver_max_vocab=0
        ).collect()
    }
    assert a == b and a


def test_unigram_apply_matches_per_word_viterbi(spark):
    df = spark.createDataFrame(
        [(1, "table scanscan"), (2, ""), (3, None)],
        "id long, text string",
    )
    rows = {r["id"]: r for r in U.unigram_apply(df, "id", "text", SCORES).collect()}
    exp1 = list(U.viterbi_segment("table", SCORES)) + list(
        U.viterbi_segment("scanscan", SCORES)
    )
    assert rows[1]["tokens"] == exp1 and rows[1]["n_tokens"] == len(exp1)
    assert rows[2]["tokens"] == [] and rows[2]["n_tokens"] == 0
    assert rows[3]["tokens"] == [] and rows[3]["n_tokens"] == 0


def _brute_expected_counts(word, logp, max_len=4, unk=-40.0):
    def p_of(piece):
        lp = logp.get(piece)
        if lp is None:
            if len(piece) > 1:
                return 0.0
            lp = unk
        return math.exp(lp)

    segs = []
    for seg in _all_segmentations(word, max_len):
        w = 1.0
        for p in seg:
            w *= p_of(p)
        if w > 0:
            segs.append((seg, w))
    z = sum(w for _, w in segs)
    out = {}
    for seg, w in segs:
        for p in seg:
            out[p] = out.get(p, 0.0) + w / z
    return out


def test_em_expected_counts_match_lattice_enumeration():
    logp = {p: math.log((c + 1) / 300.0) for p, c in SCORES.items()}
    for w in ("table", "aaaa", "scan", "row", "zq"):
        got = U.em_expected_counts(w, logp)
        exp = _brute_expected_counts(w, logp)
        assert set(got) == set(exp)
        for p in exp:
            assert abs(got[p] - exp[p]) < 1e-9, (w, p)


def test_train_em_driver_vs_distributed(spark):
    df = spark.createDataFrame(
        [(i, "table scan value table row") for i in range(5)],
        "id long, text string",
    )
    a = {
        (r["piece"], r["micro_count"])
        for r in U.unigram_train_em(df, "text", iters=2).collect()
    }
    b = {
        (r["piece"], r["micro_count"])
        for r in U.unigram_train_em(
            df, "text", iters=2, driver_max_vocab=0
        ).collect()
    }
    assert a == b and a


def test_em_long_rare_word_no_underflow():
    """Log-space forward-backward: a 60-char word of rare pieces must
    still contribute its full unit mass (probability-space alpha/beta
    underflowed to zero and silently dropped it before the fix)."""
    logp = {c: -13.0 for c in "abcdef"}
    w = "abcdef" * 10
    got = U.em_expected_counts(w, logp, max_len=4)
    assert got, "expected counts vanished (underflow)"
    # expected piece count per word sums to the number of pieces used;
    # at minimum the mass is strictly positive and finite
    total = sum(got.values())
    assert 15.0 <= total <= 60.0  # between all-4-char and all-1-char


def test_em_unknown_chars_underflow_guard():
    """18+ consecutive unknown chars (-40 each) also stay finite."""
    got = U.em_expected_counts("z" * 30, {"a": -1.0}, max_len=4)
    assert got == {"z": 30.0} or abs(sum(got.values()) - 30.0) < 1e-6
