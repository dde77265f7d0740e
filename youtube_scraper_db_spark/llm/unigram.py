"""Unigram-LM (SentencePiece-style) tokenizer TRAINING and APPLICATION
at corpus scale — the sibling of llm/bpe.py, completing the "train any
mainstream tokenizer family on-engine" story (BPE merges + unigram
pieces cover GPT-style and SentencePiece-style vocabularies).

Structure mirrors the industrial trainers (Kudo 2018):

- **Seed** (`seed_piece_counts`): candidate pieces are every substring
  of length ≤ ``max_len`` of every corpus word, frequency-weighted.
  The corpus collapses ONCE to a word vocabulary (the only
  corpus-sized shuffle — same economics as BPE training), then
  substring enumeration is a per-word array expression over the vocab.
- **Train** (`unigram_train_viterbi`): hard-EM over the word
  vocabulary. Each iteration (a) turns the previous iteration's piece
  counts into additively-smoothed quantized log-probabilities, (b)
  Viterbi-segments every vocab word under them, (c) re-counts pieces
  along the best segmentations (weighted by word count). Like
  llm/bpe.py and llm/cluster.py, the loop is measured-size adaptive:
  a vocabulary ≤ ``driver_max_vocab`` trains exactly in-process
  (vocabulary is language-bounded, not data-bounded — what
  SentencePiece itself does single-node); above that, the SAME
  semantics run distributed — the E-step is an Arrow kernel over the
  (word, wcount) vocab with the score table riding the closure, the
  count step one piece-keyed aggregate; both paths are pinned equal in
  tests.
- **Apply** (`unigram_apply`): Viterbi segmentation of the corpus
  under a trained score table — an Arrow kernel with per-batch word
  memoization, so cost tracks the vocabulary, not corpus tokens (the
  bpe_apply economics; llm/bpe.py:241).

Determinism contract (what makes the registry gate a full value-hash
oracle check instead of rows-only): scores are INTEGER micro-log
probabilities — ``floor(1e6 · ln((c + 1) / (total + |inventory|)) +
0.5)`` — so every Viterbi comparison is exact integer arithmetic, and
the tie-break chain (max total score → fewest pieces → lexicographically
smallest space-joined segmentation) is engine-independent. DuckDB
replays the whole trainer: substring seeding in SQL, the same quantized
log scores, and the DP as a recursive CTE carrying per-position best
states (see registry.py ``_unigram_train_sql``). The segmentation-string
tie-break is well-defined under DP merging: two competing prefix
segmentations of the same word prefix concatenate (spaces removed) to
the same characters, so neither can be a strict string prefix of the
other and lexicographic order is stable under appending a common
suffix.

The soft-EM refinement (`em_expected_counts` / `unigram_train_em`) is
the classic forward-backward pass over each word's segmentation lattice
(true SentencePiece E-step). Expected counts are floats; they are
quantized to integer micro-counts per (word, piece) BEFORE the
cross-word sum so the distributed aggregate is order-independent —
the same determinism device as quantize_int8 (llm/similarity.py:59).

Reference parity: the reference stores raw transcript text (ref
add_transcripts.py:1) — tokenizer training belongs to the §2.12
training-data extension surface, not reference behavior.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bpe import word_vocab
from .text import py_tokens

#: Score assigned to a single character absent from the inventory —
#: ln(prob) ≈ -40 in micro-units, far below any real piece so unknown
#: chars never out-compete inventory pieces but keep every word
#: segmentable.
UNK_SCORE = -40_000_000


def quantlog_scores(
    counts: dict[str, int], smooth: int = 1
) -> dict[str, int]:
    """Additively-smoothed integer micro-log probabilities:
    ``floor(1e6 · ln((c + smooth) / (total + smooth·|inventory|)) + 0.5)``
    over the FIXED inventory (zero-count pieces stay usable, just
    heavily penalized). Half-up-toward-+inf rounding via floor(x + 0.5)
    matches the SQL oracle literally; ln operates on the same IEEE
    quotient in both engines."""
    total = sum(counts.values()) + smooth * len(counts)
    return {
        p: math.floor(1e6 * math.log((c + smooth) / total) + 0.5)
        for p, c in counts.items()
    }


def viterbi_segment(
    word: str,
    scores: dict[str, int],
    max_len: int = 4,
    unk_score: int = UNK_SCORE,
) -> tuple[str, ...]:
    """Best segmentation of ``word`` under integer piece scores:
    maximize total score, then fewest pieces, then the lexicographically
    smallest space-joined segmentation. Multi-char substrings outside
    the inventory are not candidates; single chars always are (inventory
    score or ``unk_score``). This function IS the semantics every path
    (driver loop, Arrow kernels, SQL oracle DP) must share.

    Empty word → () — NOT ("",). ``py_tokens`` never yields empty words,
    but the no-empty-token contract (SURVEY §13.9b) is enforced HERE at
    the semantics spine so an unfiltered caller cannot silently count or
    emit '' pieces (ADVICE r06)."""
    if not word:
        return ()
    n = len(word)
    best: list[tuple[int, int, str]] = [(0, 0, "")] + [None] * n  # type: ignore[list-item]
    for j in range(1, n + 1):
        cands = []
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            sc = scores.get(piece)
            if sc is None:
                if j - i > 1:
                    continue
                sc = unk_score
            b = best[i]
            seg = piece if b[2] == "" else b[2] + " " + piece
            cands.append((b[0] - sc, b[1] + 1, seg))
        best[j] = min(cands)
    return tuple(best[n][2].split(" "))


def _word_substrings(word: str, max_len: int) -> list[str]:
    """Every substring of length 1..max_len, one entry per occurrence
    position (the seed counting unit)."""
    n = len(word)
    return [
        word[i : i + ln]
        for ln in range(1, max_len + 1)
        for i in range(n - ln + 1)
    ]


def _substrings_expr(word, max_len: int):
    """The same enumeration as a native Column expression: flatten one
    transform per length (codegen-side; no UDF)."""
    w = F.col(word) if isinstance(word, str) else word

    def slicer(ln: int):
        # a factory, not a default arg: F.transform treats a 2-arg
        # lambda as (element, index)
        return lambda i: F.substring(w, i, ln)

    per_len = [
        F.when(
            F.length(w) >= ln,
            F.transform(
                F.sequence(F.lit(1), F.length(w) - (ln - 1)), slicer(ln)
            ),
        ).otherwise(F.array().cast("array<string>"))
        for ln in range(1, max_len + 1)
    ]
    return F.flatten(F.array(*per_len))


def seed_piece_counts(
    docs: DataFrame,
    text_col: str,
    max_len: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """(piece, freq): occurrence-position-weighted substring counts over
    the corpus word vocabulary. Pieces below ``min_count`` are dropped
    UNLESS single characters (which must stay so every word remains
    segmentable). One corpus-sized shuffle (the word vocab) + one
    piece-keyed aggregate over vocab-sized data."""
    return _seed_from_vocab(word_vocab(docs, text_col), max_len, min_count)


def _seed_from_vocab(
    vocab: DataFrame, max_len: int, min_count: int
) -> DataFrame:
    """Seed counts from an ALREADY-MATERIALIZED vocab — the trainers
    pass their checkpointed vocab here so the corpus-sized word-vocab
    shuffle genuinely runs once (recomputing it from the raw corpus per
    consumer would triple the dominant cost at scale)."""
    pieces = vocab.select(
        F.explode(_substrings_expr("word", max_len)).alias("piece"),
        F.col("wcount"),
    )
    return (
        pieces.groupBy("piece")
        .agg(F.sum("wcount").cast("long").alias("freq"))
        .filter((F.col("freq") >= min_count) | (F.length("piece") == 1))
    )


def _count_best_segments(
    wcounts: dict[str, int],
    scores: dict[str, int],
    max_len: int,
) -> dict[str, int]:
    """Hard E-step: piece counts along each word's Viterbi segmentation,
    weighted by word count."""
    out: dict[str, int] = {}
    for w, c in wcounts.items():
        for piece in viterbi_segment(w, scores, max_len):
            out[piece] = out.get(piece, 0) + c
    return out


def unigram_train_viterbi(
    docs: DataFrame,
    text_col: str,
    iters: int = 2,
    max_len: int = 4,
    min_count: int = 2,
    driver_max_vocab: int = 500_000,
) -> DataFrame:
    """Hard-EM unigram trainer: seed substring counts → ``iters`` rounds
    of (quantized-log re-score → Viterbi re-segment → re-count).
    Returns the surviving vocabulary ``(piece, piece_count)`` —
    pieces used by at least one best segmentation in the final round.
    The candidate INVENTORY is fixed at seeding (only scores move), so
    the oracle can replay every round. Measured-size adaptive: the
    in-process loop below ``driver_max_vocab`` words, the distributed
    Arrow-kernel E-step above it (identical semantics, pinned in
    tests/test_unigram.py).

    The word-vocab collapse — the ONLY corpus-sized shuffle — runs
    exactly once: the vocab is checkpointed eagerly, and the size
    probe, the collect/E-steps, and the substring seeding all read the
    materialized copy."""
    vocab = word_vocab(docs, text_col).localCheckpoint()
    # limit(N+1).count(): the probe only needs "≤ N or not", so scan at
    # most N+1 rows instead of a full-vocab aggregate (bpe.py's device)
    if vocab.limit(driver_max_vocab + 1).count() <= driver_max_vocab:
        wc = {r["word"]: int(r["wcount"]) for r in vocab.collect()}
        seed: dict[str, int] = {}
        for w, c in wc.items():
            for piece in _word_substrings(w, max_len):
                seed[piece] = seed.get(piece, 0) + c
        counts = {
            p: c
            for p, c in seed.items()
            if c >= min_count or len(p) == 1
        }
        inventory = set(counts)
        for _ in range(iters):
            scores = quantlog_scores(counts)
            used = _count_best_segments(wc, scores, max_len)
            counts = {p: used.get(p, 0) for p in inventory}
        rows = [(p, c) for p, c in counts.items() if c > 0]
        return docs.sparkSession.createDataFrame(
            rows, "piece string, piece_count long"
        )
    return _train_distributed(
        vocab,
        _seed_from_vocab(vocab, max_len, min_count),
        iters,
        max_len,
    )


def _train_distributed(
    vocab: DataFrame,
    seed: DataFrame,
    iters: int,
    max_len: int,
) -> DataFrame:
    """The same hard-EM loop with the WORD VOCAB kept distributed: each
    iteration broadcasts the score table (piece inventory is
    language-bounded — the same closure-borne table as bpe_apply's merge
    ranks) and runs the E-step as an Arrow kernel over (word, wcount),
    then one piece-keyed aggregate. Only vocab-sized data ever
    shuffles; the corpus was left behind at the word-vocab collapse
    (``vocab`` arrives already checkpointed by the caller)."""
    counts = {r["piece"]: int(r["freq"]) for r in seed.collect()}
    inventory = set(counts)
    out_schema = T.StructType(
        [
            T.StructField("piece", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    for _ in range(iters):
        scores = quantlog_scores(counts)

        def estep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                local: dict[str, int] = {}
                for w, c in zip(pdf["word"], pdf["wcount"]):
                    for piece in viterbi_segment(w, scores, max_len):
                        local[piece] = local.get(piece, 0) + int(c)
                yield pd.DataFrame(
                    {"piece": list(local), "cnt": list(local.values())}
                )

        used_rows = (
            vocab.mapInPandas(estep, schema=out_schema)
            .groupBy("piece")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .collect()
        )
        used = {r["piece"]: int(r["cnt"]) for r in used_rows}
        counts = {p: used.get(p, 0) for p in inventory}
    rows = [(p, c) for p, c in counts.items() if c > 0]
    return vocab.sparkSession.createDataFrame(
        rows, "piece string, piece_count long"
    )


def unigram_apply(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    scores: dict[str, int],
    max_len: int = 4,
) -> DataFrame:
    """Viterbi-tokenize the corpus under a trained integer score table:
    ``(id, tokens array<string>, n_tokens)``. Arrow kernel with
    per-batch word memoization — per-row cost is a dict hit, fold cost
    tracks vocabulary, not corpus tokens (llm/bpe.py bpe_apply
    economics). Map-only: zero shuffle at any scale."""
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
                memo[word] = got = viterbi_segment(word, scores, max_len)
            return got

        for pdf in batches:
            ids, toks, ns = [], [], []
            for i, text in zip(pdf["id"], pdf["text"]):
                doc: list[str] = []
                for w in py_tokens(text):
                    doc.extend(encode(w))
                ids.append(i)
                toks.append(doc)
                ns.append(len(doc))
            yield pd.DataFrame({"id": ids, "tokens": toks, "n_tokens": ns})

    return docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(kernel, schema=out_schema)


def unigram_doc_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    scores: dict[str, int],
    max_len: int = 4,
    unk_score: int = UNK_SCORE,
) -> DataFrame:
    """LM-based quality scoring (the CCNet/KenLM filtering stage, with
    the on-engine-trained unigram LM): ``(id, total_micrologp,
    n_pieces)`` where total_micrologp is the document's Viterbi
    log-likelihood in integer micro-log-prob units (higher = more
    typical of the training corpus) and n_pieces its token count —
    downstream filters threshold on total/n_pieces (per-token NLL ≡
    log-perplexity). All-integer, so the whole train→score path is
    oracle-replayable. Arrow kernel, word-memoized, map-only."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("total_micrologp", T.LongType()),
            T.StructField("n_pieces", T.IntegerType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, tuple[int, int]] = {}

        def score(word: str) -> tuple[int, int]:
            got = memo.get(word)
            if got is None:
                seg = viterbi_segment(word, scores, max_len, unk_score)
                tot = sum(scores.get(p, unk_score) for p in seg)
                memo[word] = got = (tot, len(seg))
            return got

        for pdf in batches:
            ids, tots, ns = [], [], []
            for i, text in zip(pdf["id"], pdf["text"]):
                t, n = 0, 0
                for w in py_tokens(text):
                    wt, wn = score(w)
                    t += wt
                    n += wn
                ids.append(i)
                tots.append(t)
                ns.append(n)
            yield pd.DataFrame(
                {"id": ids, "total_micrologp": tots, "n_pieces": ns}
            )

    return docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(kernel, schema=out_schema)


# ---------------------------------------------------------------------------
# Soft EM (forward-backward) — the true SentencePiece E-step.
# ---------------------------------------------------------------------------


def em_expected_counts(
    word: str,
    logp: dict[str, float],
    max_len: int = 4,
    unk_logp: float = -40.0,
) -> dict[str, float]:
    """Expected piece counts for one word under the unigram LM: the
    standard lattice forward-backward. ``alpha[i]`` sums path
    probabilities over segmentations of ``word[:i]``, ``beta[j]`` over
    ``word[j:]``; a piece spanning (i, j) contributes
    ``alpha[i]·p(piece)·beta[j] / alpha[n]``. Computed entirely in
    LOG space (per-position logsumexp): probability-space sums
    underflow to zero around 55 rare-piece chars (e.g. URLs, hex
    blobs — ~-13 ln-prob per char passes ln(DBL_MIN) ≈ -708) and
    would silently drop the word's whole mass from the E-step."""
    n = len(word)
    NEG = float("-inf")

    def lp_of(piece: str) -> float | None:
        lp = logp.get(piece)
        if lp is None:
            return unk_logp if len(piece) == 1 else None
        return lp

    def lse(vals: list[float]) -> float:
        m = max(vals, default=NEG)
        if m == NEG:
            return NEG
        return m + math.log(sum(math.exp(v - m) for v in vals))

    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        cands = []
        for i in range(max(0, j - max_len), j):
            lp = lp_of(word[i:j])
            if lp is not None and alpha[i] != NEG:
                cands.append(alpha[i] + lp)
        alpha[j] = lse(cands)
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        cands = []
        for j in range(i + 1, min(n, i + max_len) + 1):
            lp = lp_of(word[i:j])
            if lp is not None and beta[j] != NEG:
                cands.append(lp + beta[j])
        beta[i] = lse(cands)
    z = alpha[n]
    out: dict[str, float] = {}
    if z == NEG:
        return out
    for i in range(n):
        for j in range(i + 1, min(n, i + max_len) + 1):
            lp = lp_of(word[i:j])
            if lp is None or alpha[i] == NEG or beta[j] == NEG:
                continue
            contrib = math.exp(alpha[i] + lp + beta[j] - z)
            if contrib > 0.0:
                piece = word[i:j]
                out[piece] = out.get(piece, 0.0) + contrib
    return out


#: Micro-count quantum for distributed soft-EM aggregation: expected
#: counts are quantized per (word, piece) BEFORE the cross-word sum, so
#: the distributed aggregate is an exact integer sum — independent of
#: accumulation order (same device as quantize_int8).
EM_QUANTUM = 1_000_000


def unigram_train_em(
    docs: DataFrame,
    text_col: str,
    iters: int = 2,
    max_len: int = 4,
    min_count: int = 2,
    driver_max_vocab: int = 500_000,
) -> DataFrame:
    """Soft-EM unigram trainer (true SentencePiece E-step): seed
    substring counts → ``iters`` rounds of forward-backward expected
    counts → re-estimated log-probs. Returns ``(piece, micro_count)``
    where micro_count is the final expected count in 1e-6 units
    (integer — see EM_QUANTUM). Measured-size adaptive exactly like the
    Viterbi trainer; the distributed E-step quantizes per (word, piece)
    before aggregating so both paths produce identical integers (pinned
    in tests/test_unigram.py). Like the Viterbi trainer, the word-vocab
    collapse runs once: size probe, E-steps, and seeding all read the
    eagerly-checkpointed vocab."""
    vocab = word_vocab(docs, text_col).localCheckpoint()
    # limit(N+1).count() — see unigram_train_viterbi / bpe.py
    small = vocab.limit(driver_max_vocab + 1).count() <= driver_max_vocab
    if small:
        wc_rows = [(r["word"], int(r["wcount"])) for r in vocab.collect()]
    seed = _seed_from_vocab(vocab, max_len, min_count)
    counts = {r["piece"]: float(r["freq"]) for r in seed.collect()}
    inventory = sorted(counts)
    micro: dict[str, int] = {}
    for _ in range(iters):
        total = sum(counts.values()) + len(inventory)
        logp = {
            p: math.log((counts[p] + 1.0) / total) for p in inventory
        }
        if small:
            micro = {}
            for w, c in wc_rows:
                ec = em_expected_counts(w, logp, max_len)
                for piece, v in ec.items():
                    micro[piece] = micro.get(piece, 0) + int(
                        math.floor(v * c * EM_QUANTUM + 0.5)
                    )
        else:
            micro = _em_distributed(vocab, logp, max_len)
        counts = {p: micro.get(p, 0) / EM_QUANTUM for p in inventory}
    rows = [(p, m) for p, m in sorted(micro.items()) if m > 0]
    return docs.sparkSession.createDataFrame(
        rows, "piece string, micro_count long"
    )


def _em_distributed(
    vocab: DataFrame, logp: dict[str, float], max_len: int
) -> dict[str, int]:
    """One distributed soft E-step: Arrow kernel computes per-word
    expected counts, quantizes to integer micro-counts per (word,
    piece), and the piece-keyed integer sum is exact regardless of
    partitioning."""
    out_schema = T.StructType(
        [
            T.StructField("piece", T.StringType()),
            T.StructField("micro", T.LongType()),
        ]
    )

    def estep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            local: dict[str, int] = {}
            for w, c in zip(pdf["word"], pdf["wcount"]):
                for piece, v in em_expected_counts(w, logp, max_len).items():
                    q = int(math.floor(v * int(c) * EM_QUANTUM + 0.5))
                    if q:
                        local[piece] = local.get(piece, 0) + q
            yield pd.DataFrame(
                {"piece": list(local), "micro": list(local.values())}
            )

    rows = (
        vocab.mapInPandas(estep, schema=out_schema)
        .groupBy("piece")
        .agg(F.sum("micro").cast("long").alias("micro"))
        .collect()
    )
    return {r["piece"]: int(r["micro"]) for r in rows}
