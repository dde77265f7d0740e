"""WordPiece tokenizer TRAINING and APPLICATION at corpus scale — the
BERT-style greedy-longest-match family, completing the mainstream
tokenizer trio next to BPE (llm/bpe.py) and unigram-LM (llm/unigram.py).

- **Train** (`wordpiece_train`): the same economics as ``bpe_train`` —
  the corpus collapses ONCE to a word vocabulary with counts (the only
  corpus-sized shuffle), then the merge loop runs over the vocabulary
  alone. The selection rule is WordPiece's likelihood-ratio score
  ``count(pair) / (count(left) · count(right))`` instead of BPE's raw
  pair count; argmax ties break lexicographically. Scores are compared
  EXACTLY — the driver loop cross-multiplies Python integers, the
  distributed fallback pre-filters by float score with a 1e-9 relative
  margin (double error is ~1e-16, so the true argmax always survives)
  and exact-compares the survivors — so both paths and the DuckDB
  oracle (HUGEINT cross-multiplication) pick the identical pair even
  on rational-score ties.
- **Apply** (`wordpiece_apply`): greedy longest-match-first against a
  fixed vocabulary, continuation pieces carrying the ``##`` prefix; a
  word with any unmatchable position becomes ``[UNK]`` whole (the BERT
  convention). Arrow kernel with per-batch word memoization — per-row
  cost is a dict hit, matching the ``bpe_apply`` economics — and the
  oracle replays the greedy scan as a recursive CTE (deterministic, so
  unlike unigram's Viterbi there is no tie-break lattice to carry).

Symbol model: a word's first piece is written bare, every later piece
carries ``##``; merging (l, r) therefore always sees an ``r`` starting
with ``##`` and produces ``l + r[2:]``, preserving l's position class.
Sequential-by-rank application is exact for the same reason as BPE
(llm/bpe.py module docstring): a merge can never mint an earlier
rank's operand or create new adjacency.

Reference parity: N/A — tokenizer training is §2.12 training-data
extension surface (the reference stores raw transcript text,
ref add_transcripts.py:1).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import text as llm_text
from .bpe import word_vocab

UNK = "[UNK]"

#: default longest piece (in raw word chars, the ## prefix excluded) the
#: greedy matcher will try — bounds the per-position probe count; every
#: path (kernel, recursive-CTE oracle) shares it. ``wordpiece_apply``
#: derives the bound from the SUPPLIED vocabulary instead
#: (``vocab_probe_bound``) so a trained vocabulary with longer merged
#: pieces is never silently unmatchable (r07 ADVICE: merge chains are
#: uncapped, so train→apply composition must not lose long pieces).
MAX_PIECE_CHARS = 6


def vocab_probe_bound(vocab) -> int:
    """The greedy matcher's probe bound for a given vocabulary: the
    longest piece's raw char length (## prefix excluded), floored at
    MAX_PIECE_CHARS so hand-fixed short vocabularies keep the documented
    default. Probing past the longest piece can never match, so this is
    lossless and still O(max piece) per position."""
    longest = max(
        (len(p) - 2 if p.startswith("##") else len(p) for p in vocab),
        default=0,
    )
    return max(MAX_PIECE_CHARS, longest)


def wordpiece_word(
    word: str,
    vocab: frozenset[str] | set[str],
    unk: str = UNK,
    max_piece_chars: int = MAX_PIECE_CHARS,
) -> tuple[str, ...]:
    """Greedy longest-match segmentation of one word — the semantics
    every path (Arrow kernel, SQL oracle recursion, tests) must share.
    Empty word → () (the no-empty-token contract, enforced at the
    spine like ``viterbi_segment``)."""
    if not word:
        return ()
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        hit = None
        for ln in range(min(max_piece_chars, n - i), 0, -1):
            cand = word[i : i + ln] if i == 0 else "##" + word[i : i + ln]
            if cand in vocab:
                hit = (ln, cand)
                break
        if hit is None:
            return (unk,)
        out.append(hit[1])
        i += hit[0]
    return tuple(out)


def wordpiece_apply(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab: set[str] | frozenset[str],
    unk: str = UNK,
    max_piece_chars: int | None = None,
) -> DataFrame:
    """Tokenize the corpus under a fixed WordPiece vocabulary: (id,
    tokens array<string>, n_tokens). Map-only Arrow kernel; the vocab
    rides the closure (O(|vocab|) per executor) and each batch memoizes
    per DISTINCT word, so cost tracks vocabulary, not corpus tokens —
    the ``bpe_apply`` economics. The probe bound defaults to
    ``vocab_probe_bound(vocab)`` so every supplied piece is matchable
    regardless of how long training let merge chains grow."""
    v = frozenset(vocab)
    if max_piece_chars is None:
        max_piece_chars = vocab_probe_bound(v)

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, tuple] = {}

        def encode(word: str) -> tuple:
            got = memo.get(word)
            if got is None:
                memo[word] = got = wordpiece_word(
                    word, v, unk, max_piece_chars
                )
            return got

        for pdf in batches:
            ids, toks, ns = [], [], []
            for i, text in zip(pdf["id"], pdf["text"]):
                doc: list[str] = []
                for w in llm_text.py_tokens(text):
                    doc.extend(encode(w))
                ids.append(i)
                toks.append(doc)
                ns.append(len(doc))
            yield pd.DataFrame({"id": ids, "tokens": toks, "n_tokens": ns})

    return docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(kernel, schema=out_schema)


def _wp_init(word: str) -> tuple[str, ...]:
    """Initial segmentation: bare first char, ##-prefixed rest."""
    return (word[0],) + tuple("##" + c for c in word[1:])


def merge_wp(symbols: tuple, left: str, right: str) -> tuple:
    """One-pass leftmost non-overlapping merge — identical control flow
    to ``bpe.merge_word`` but the merged symbol strips the
    continuation prefix from ``right`` (which always carries it; see
    module docstring)."""
    merged = left + right[2:]
    out = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def _score_argmax(
    cands: list[tuple[str, str, int, int, int]],
) -> tuple[str, str, int, int, int]:
    """Exact rational argmax of pc/(lc·rc) with lexicographic (l, r)
    tie-break — integer cross-multiplication, no floats anywhere."""
    best = cands[0]
    for c in cands[1:]:
        # c beats best iff c.pc/(c.lc·c.rc) > best.pc/(best.lc·best.rc)
        lhs = c[2] * best[3] * best[4]
        rhs = best[2] * c[3] * c[4]
        if lhs > rhs or (lhs == rhs and (c[0], c[1]) < (best[0], best[1])):
            best = c
    return best


def _train_driver(
    wcounts: dict, num_merges: int, distinct_pairs: bool
) -> list[tuple[str, str, int, int, int]]:
    """Exact in-process WordPiece merge loop over the collected word
    vocabulary: per rank, pair counts AND symbol counts feed the
    likelihood-ratio score."""
    segs: dict[tuple, int] = {}
    for w, c in wcounts.items():
        key = _wp_init(w)
        segs[key] = segs.get(key, 0) + c
    merges: list[tuple[str, str, int, int, int]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        sym_counts: dict[str, int] = {}
        for seg, c in segs.items():
            for s in seg:
                sym_counts[s] = sym_counts.get(s, 0) + c
            for a, b in zip(seg, seg[1:]):
                if distinct_pairs and a == b:
                    continue
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        cands = [
            (left, right, pc, sym_counts[left], sym_counts[right])
            for (left, right), pc in pair_counts.items()
        ]
        best = _score_argmax(cands)
        merges.append(best)
        left, right = best[0], best[1]
        nxt: dict[tuple, int] = {}
        for seg, c in segs.items():
            m = merge_wp(seg, left, right)
            nxt[m] = nxt.get(m, 0) + c
        segs = nxt
    return merges


def _train_distributed(
    vocab: DataFrame, num_merges: int, distinct_pairs: bool
) -> list[tuple[str, str, int, int, int]]:
    """The same loop with the vocabulary kept distributed (vocab-sized
    shuffles only, lineage cut per iteration — the bpe.py shape). The
    argmax is exact despite the distributed float pre-rank: candidates
    within 1e-9 relative of the float-max score (double error ~1e-16)
    are collected — a handful of rows — and the winner is picked by
    integer cross-multiplication on the driver."""
    from .bpe import _adjacent_pairs

    segs = vocab.select(
        F.concat(
            F.array(F.substring("word", 1, 1)),
            F.transform(
                # guard the 1-char word: split("", "") is [""], which
                # would mint a phantom "##" symbol
                F.filter(
                    F.split(F.substring(F.col("word"), 2, 1 << 30), ""),
                    lambda c: c != F.lit(""),
                ),
                lambda c: F.concat(F.lit("##"), c),
            ),
        ).alias("seg"),
        F.col("wcount"),
    ).localCheckpoint()
    merges: list[tuple[str, str, int, int, int]] = []
    for _ in range(num_merges):
        syms = (
            segs.select(F.explode("seg").alias("s"), "wcount")
            .groupBy("s")
            .agg(F.sum("wcount").alias("sc"))
        )
        pairs = segs.select(
            F.explode(_adjacent_pairs(F.col("seg"))).alias("p"), "wcount"
        )
        if distinct_pairs:
            pairs = pairs.filter(F.col("p.l") != F.col("p.r"))
        cand = (
            pairs.groupBy("p")
            .agg(F.sum("wcount").alias("pc"))
            .join(
                F.broadcast(syms.withColumnRenamed("s", "l_s")),
                F.col("p.l") == F.col("l_s"),
            )
            .withColumnRenamed("sc", "lc")
            .join(
                F.broadcast(
                    syms.select(
                        F.col("s").alias("r_s"), F.col("sc").alias("rc")
                    )
                ),
                F.col("p.r") == F.col("r_s"),
            )
            .select("p", "pc", "lc", "rc")
        )
        scored = cand.withColumn(
            # cast BEFORE multiplying: lc·rc as longs would wrap past
            # 2^63 at extreme corpus counts (~1e13 each); as doubles the
            # pre-rank stays approximate-but-sane and the exact integer
            # re-compare below decides the winner regardless
            "fscore",
            F.col("pc")
            / (F.col("lc").cast("double") * F.col("rc").cast("double")),
        )
        mx = scored.agg(F.max("fscore").alias("m")).first()["m"]
        if mx is None:
            break
        near = scored.filter(
            F.col("fscore") >= F.lit(float(mx)) * (1.0 - 1e-9)
        ).collect()
        best = _score_argmax(
            [
                (r["p"]["l"], r["p"]["r"], int(r["pc"]), int(r["lc"]), int(r["rc"]))
                for r in near
            ]
        )
        merges.append(best)
        left, right = best[0], best[1]
        merged = left + right[2:]
        segs = segs.select(
            _merge_expr_wp(F.col("seg"), left, right, merged).alias("seg"),
            "wcount",
        ).localCheckpoint()
    return merges


def _merge_expr_wp(seg, left: str, right: str, merged: str):
    """bpe._merge_expr with an explicit merged symbol (WordPiece strips
    the ## from the right operand)."""
    lr = F.lit(merged)
    empty = F.array().cast("array<string>")
    return F.aggregate(
        seg,
        F.struct(empty.alias("out"), F.lit(None).cast("string").alias("pend")),
        lambda acc, x: F.when(
            acc["pend"].isNull(),
            F.struct(acc["out"].alias("out"), x.alias("pend")),
        )
        .when(
            (acc["pend"] == F.lit(left)) & (x == F.lit(right)),
            F.struct(
                F.concat(acc["out"], F.array(lr)).alias("out"),
                F.lit(None).cast("string").alias("pend"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                x.alias("pend"),
            )
        ),
        lambda acc: F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        ),
    )


def wordpiece_train(
    docs: DataFrame,
    text_col: str,
    num_merges: int,
    distinct_pairs: bool = False,
    driver_max_vocab: int = 500_000,
) -> list[tuple[str, str, int, int, int]]:
    """Learn ``num_merges`` WordPiece merges from the corpus; returns
    [(left, right, pair_count, left_count, right_count)] in rank order
    (the counts exhibit the score so the oracle can hash-check the
    selection evidence, not just the chosen pair). ``distinct_pairs``
    excludes same-symbol candidates — the variant whose seg-string
    double-replace SQL transduction is provably exact, same trade as
    ``bpe_train``. Adaptive: measured vocab ≤ ``driver_max_vocab`` runs
    the exact in-process loop, larger runs the distributed twin (pinned
    equal in tests/test_wordpiece.py)."""
    # localCheckpoint BEFORE the probe: limit() on an aggregate still
    # runs the full corpus-sized groupBy, so without the cut the most
    # expensive shuffle in the job would execute twice (probe + train) —
    # the unigram.py device
    vocab = word_vocab(docs, text_col).localCheckpoint()
    if vocab.limit(driver_max_vocab + 1).count() <= driver_max_vocab:
        wc = {r["word"]: r["wcount"] for r in vocab.collect()}
        return _train_driver(wc, num_merges, distinct_pairs)
    return _train_distributed(vocab, num_merges, distinct_pairs)
