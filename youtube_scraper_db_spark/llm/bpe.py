"""Byte-pair-encoding tokenizer TRAINING and APPLICATION at corpus scale.

The round-4 surface (``llm/text.py char_pairs`` + the
``bpe_pair_counts`` gate) covered the heavy inner step of one training
iteration; this module completes the workflow the way industrial
tokenizer trainers structure it:

- **Train** (`bpe_train`): the corpus collapses ONCE to a word
  vocabulary with counts (the only corpus-sized shuffle — identical to
  the pre-count every production BPE trainer performs), then the merge
  loop runs over the vocabulary alone, so each of the N iterations
  costs O(|vocab|), independent of corpus size. Like the
  connected-components driver (llm/cluster.py), the loop is adaptive:
  a measured vocabulary ≤ ``driver_max_vocab`` runs the exact loop
  in-process (what single-node trainers do — |vocab| is bounded by
  language, not data volume), anything larger runs the same algorithm
  distributed — adjacent-pair enumeration and the one-pass merge are
  native Column expressions (``F.transform`` / ``F.aggregate`` folds,
  zero Python), with ``localCheckpoint`` lineage cuts across
  iterations.
- **Apply** (`bpe_apply` / `bpe_apply_expr`): `bpe_apply_expr` builds
  the tokenization as a pure Column expression (a fold per merge —
  whole-stage-codegen'd, used by the oracle gate with its fixed merge
  list); `bpe_apply` takes arbitrary-size learned merge tables through
  an Arrow kernel with per-batch word memoization (words repeat — the
  per-distinct-word cost is the 100 TB property; a global
  distinct-word → encode → broadcast-join-back phrasing is equivalent
  and the kernel documents it).

Merge semantics (pinned by tests against an independent reference):
each rank merges ALL non-overlapping occurrences of its pair in one
left-to-right pass, ranks applied in order. Sequential-by-rank equals
priority-queue application because merging never re-creates a
lower-rank pair: a merge replaces two adjacent symbols with their
concatenation, so it can neither bring two other symbols adjacent nor
mint a symbol equal to an earlier rank's operand (operands of rank k
are only producible by ranks < k).

Reference parity: the reference stores raw transcript text
(ref add_transcripts.py:1) — tokenizer training is part of the §2.12
training-data extension surface, not reference behavior.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import text as llm_text

MERGE_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, wcount) over the whitespace tokens — the single
    corpus-sized shuffle of BPE training. Empty tokens are dropped:
    Spark's trim strips SPACES only, so tab/newline-led text yields a
    leading '' from the split — the apply kernels (py_tokens) never see
    it, and a phantom '' word would desync training from application."""
    return (
        docs.select(F.explode(llm_text.tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def merge_word(symbols: tuple, left: str, right: str) -> tuple:
    """One-pass leftmost non-overlapping merge of (left, right) in a
    symbol sequence — the semantics every path (driver loop, Column
    fold, Arrow kernel, SQL oracle transduction) must share."""
    out = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def _train_driver(
    wcounts: dict, num_merges: int, distinct_pairs: bool
) -> list[tuple[str, str, int]]:
    """Exact in-process merge loop over the collected vocabulary."""
    segs: dict[tuple, int] = {}
    for w, c in wcounts.items():
        key = tuple(w)
        segs[key] = segs.get(key, 0) + c
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for seg, c in segs.items():
            for a, b in zip(seg, seg[1:]):
                if distinct_pairs and a == b:
                    continue
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        # deterministic argmax: count desc, then lexicographic pair
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((left, right, cnt))
        nxt: dict[tuple, int] = {}
        for seg, c in segs.items():
            m = merge_word(seg, left, right)
            nxt[m] = nxt.get(m, 0) + c
        segs = nxt
    return merges


def _adjacent_pairs(seg: Column) -> Column:
    """Native adjacent-pair enumeration over an array<string> column —
    guard the 1-symbol case (Spark's sequence(0, -1) DESCENDS)."""
    return F.when(
        F.size(seg) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(seg) - 2),
            lambda i: F.struct(
                F.element_at(seg, i + 1).alias("l"),
                F.element_at(seg, i + 2).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _merge_expr(seg: Column, left: str, right: str) -> Column:
    """The one-pass merge as a native fold: state (out, pend) — pend is
    the symbol awaiting its pair partner; finish flushes it."""
    lr = F.lit(left + right)
    empty = F.array().cast("array<string>")
    return F.aggregate(
        seg,
        F.struct(
            empty.alias("out"), F.lit(None).cast("string").alias("pend")
        ),
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
        lambda acc: F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"]))),
    )


def _train_distributed(
    vocab: DataFrame, num_merges: int, distinct_pairs: bool
) -> list[tuple[str, str, int]]:
    """The same loop with the vocabulary kept distributed: each
    iteration is one pair-count aggregate (ids-sized shuffle over the
    vocab, never the corpus) + a native fold rewriting segmentations.
    Lineage is cut with localCheckpoint so iteration N's plan does not
    embed iterations 1..N-1."""
    segs = vocab.select(
        F.split(F.col("word"), "").alias("seg"), F.col("wcount")
    ).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = segs.select(
            F.explode(_adjacent_pairs(F.col("seg"))).alias("p"), "wcount"
        )
        if distinct_pairs:
            pairs = pairs.filter(F.col("p.l") != F.col("p.r"))
        top = (
            pairs.groupBy("p")
            .agg(F.sum("wcount").alias("cnt"))
            .orderBy(F.desc("cnt"), F.col("p.l"), F.col("p.r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["p"]["l"], top[0]["p"]["r"], top[0]["cnt"]
        merges.append((left, right, int(cnt)))
        segs = segs.select(
            _merge_expr(F.col("seg"), left, right).alias("seg"), "wcount"
        ).localCheckpoint()
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str,
    num_merges: int,
    distinct_pairs: bool = False,
    driver_max_vocab: int = 500_000,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns
    [(left, right, pair_count)] in rank order. ``distinct_pairs``
    excludes same-symbol candidates (the variant whose transduction a
    SQL oracle can replay exactly — see the ``bpe_trained_merges``
    gate); default False is standard BPE. Adaptive like
    llm/cluster.py: the measured vocabulary picks the in-process exact
    loop or the distributed one — both implement identical semantics
    (pinned against each other and an independent reference in
    tests/test_bpe.py)."""
    # localCheckpoint BEFORE the probe — the size probe and the training
    # loop must not each re-run the corpus-sized word-vocab shuffle
    vocab = word_vocab(docs, text_col).localCheckpoint()
    if vocab.limit(driver_max_vocab + 1).count() <= driver_max_vocab:
        wc = {r["word"]: r["wcount"] for r in vocab.collect()}
        return _train_driver(wc, num_merges, distinct_pairs)
    return _train_distributed(vocab, num_merges, distinct_pairs)


def bpe_apply_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Tokenize one word column under a FIXED merge list as a pure
    Column expression: char split, then one native fold per rank —
    whole-stage codegen, zero Python; right-sized for oracle gates and
    small inference vocabularies (expression depth grows with
    len(merges); use ``bpe_apply`` beyond ~10²)."""
    seg = F.split(word, "")
    for left, right in merges:
        seg = _merge_expr(seg, left, right)
    return seg


def bpe_apply(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize the corpus under a learned merge table of ANY size:
    (id, tokens array<string>, n_tokens). Arrow kernel; the merge list
    rides the closure (rank dict, O(merges) memory per executor — the
    broadcast-variable equivalent), and each batch memoizes per
    DISTINCT word, so cost tracks vocabulary, not corpus tokens — the
    same economics as a global distinct-word → encode → broadcast-join
    plan without its extra shuffle."""
    ranks = [(left, right) for left, right, *_ in merges]

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
                seg = tuple(word)
                for left, right in ranks:
                    seg = merge_word(seg, left, right)
                memo[word] = got = seg
            return got

        for pdf in batches:
            ids, toks, ns = [], [], []
            for i, text in zip(pdf["id"], pdf["text"]):
                words = llm_text.py_tokens(text)
                doc: list[str] = []
                for w in words:
                    doc.extend(encode(w))
                ids.append(i)
                toks.append(doc)
                ns.append(len(doc))
            yield pd.DataFrame(
                {"id": ids, "tokens": toks, "n_tokens": ns}
            )

    return docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(kernel, schema=out_schema)
