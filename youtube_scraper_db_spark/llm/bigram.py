"""Bigram language model with stupid backoff for quality scoring — the
context-sensitive extension of ``doc_unigram_quality`` (the actual
CCNet filter shape: train a cheap LM on a reference slice, score every
document, threshold on per-token log-prob).

Model (Brants et al. 2007, "Large Language Models in Machine
Translation" — stupid backoff): the transition score is

    S(b | a) = count(a b) / count(a ·)        if count(a b) > 0
             = 0.4 · U(b)                     otherwise (back off)

where U is the additively-smoothed unigram distribution and 0.4 the
paper's fixed backoff factor. Scores are not normalized probabilities
— that is exactly what makes the model cheap at corpus scale (no
discount/normalization pass) and exactly replayable: everything is a
ratio of exact integer counts.

Integer micro-log device (llm/unigram.py quantlog_scores): every score
is quantized to ``floor(1e6·ln(x) + 0.5)`` micro-log units, where x is
a quotient of exact integers — both engines compute the same IEEE
double and the same integer, so the DuckDB oracle replays the WHOLE
train→score path value-for-value. The backoff factor contributes the
constant ``floor(1e6·ln(0.4) + 0.5)`` = -916291 micro-units.

Train/score split: the LM trains on a FILTERED slice (the gate uses
``doc_id % 2 = 0``) and scores the whole corpus — held-out documents
contain unseen transitions, so the backoff path genuinely fires (a
model trained and scored on the same corpus never backs off: every
observed transition has count ≥ 1). Unseen words score as the smoothed
zero-count unigram ``floor(1e6·ln(1/T) + 0.5)``; unseen contexts back
off by construction. Total over every input, including empty/NULL text
(scores 0 over 0 tokens).

Scale shape: two corpus-sized aggregates (unigram + bigram counts over
the training slice), then the scoring pass is transition rows joined
against model tables that are type-counted (unigram ≪ corpus; bigram
types sublinear in corpus tokens) and one per-document sum. Join
strategy is left to AQE — it broadcasts the model tables when runtime
stats allow and shuffle-joins when a 100 TB training slice makes them
executor-unsafe. All native Column expressions; no Python anywhere.

Reference parity: N/A — §2.12 training-data extension surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as llm_text

#: floor(1e6·ln(0.4) + 0.5) — the stupid-backoff factor in micro-log
#: units; embedded as an integer literal on BOTH engine and oracle
#: sides so they cannot diverge.
BACKOFF_MU = math.floor(1e6 * math.log(0.4) + 0.5)


def _mu_log(x: Column) -> Column:
    """floor(1e6·ln(x) + 0.5) as BIGINT — the shared quantizer."""
    return F.floor(F.lit(1e6) * F.log(x) + F.lit(0.5)).cast("long")


def _pairs(t: Column) -> Column:
    """Adjacent (a, b) struct pairs of a token array (< 2 tokens → [])."""
    m = F.greatest(F.size(t) - 1, F.lit(0))
    return F.zip_with(
        F.slice(t, 1, m),
        F.slice(t, 2, m),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def tok_frame(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The ``(id, t)`` tokenized-corpus frame every trainer/scorer in
    this module derives from. Exposed so a caller that both trains and
    scores (or scores under two models) can tokenize ONCE, cache the
    result (``persist``), and pass it via the ``tok=``
    parameter — without it, each train aggregate and each scoring
    branch is an independent consumer of this lazy projection and
    re-runs the full text scan + regex split (7-10 corpus passes in the
    artifact gates; at 100 TB each pass is a full corpus read)."""
    return docs.select(
        F.col(id_col).alias("id"), llm_text.tokens(text_col).alias("t")
    )


def _tok(
    docs: DataFrame, id_col: str, text_col: str, tok: DataFrame | None
) -> DataFrame:
    return tok if tok is not None else tok_frame(docs, id_col, text_col)


def bigram_model_tables(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    train_pred: Column | None = None,
    tok: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The bigram LM's ENTIRE persistable state: the unigram count
    table ``(w, c)`` and the bigram count table ``(a, b, c2)`` over the
    training slice. Everything else the scorer needs — the smoothing
    total T, the micro-log unigram scores, the context totals c(a ·) —
    is a pure derivation of these two tables, which is what makes
    count-persistence sufficient (``bigram_model_artifact_roundtrip``
    saves exactly these through the archive's versioned commit and
    re-derives the rest on load). ``tok`` short-circuits tokenization
    with a shared pre-tokenized ``(id, t)`` frame (see ``tok_frame``)."""
    tok = _tok(docs, id_col, text_col, tok)
    train = tok.filter(train_pred) if train_pred is not None else tok
    uni = (
        train.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        train.select(F.explode(_pairs(F.col("t"))).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    return uni, big


def merge_model_tables(
    uni_a: DataFrame,
    big_a: DataFrame,
    uni_b: DataFrame,
    big_b: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Fold two bigram models trained on DISJOINT corpus slices into
    one: counts are sum-mergeable (full-outer join + coalesced sum per
    key), so the folded model is EXACTLY the model retrained on the
    union — the incremental-maintenance story for the LM family (the
    CMS cell-merge economics applied to count tables): a new document
    batch folds into last month's saved model with one vocabulary-sized
    merge, no corpus re-scan."""
    uni = (
        uni_a.select("w", F.col("c").alias("ca"))
        .join(uni_b.select("w", F.col("c").alias("cb")), "w", "full_outer")
        .select(
            "w",
            (F.coalesce("ca", F.lit(0)) + F.coalesce("cb", F.lit(0))).alias(
                "c"
            ),
        )
    )
    big = (
        big_a.select("a", "b", F.col("c2").alias("ca"))
        .join(
            big_b.select("a", "b", F.col("c2").alias("cb")),
            ["a", "b"],
            "full_outer",
        )
        .select(
            "a",
            "b",
            (F.coalesce("ca", F.lit(0)) + F.coalesce("cb", F.lit(0))).alias(
                "c2"
            ),
        )
    )
    return uni, big


def merge_trigram_model_tables(
    a: tuple[DataFrame, DataFrame, DataFrame],
    b: tuple[DataFrame, DataFrame, DataFrame],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fold two trigram models trained on DISJOINT corpus slices into
    one — ``merge_model_tables`` generalized to order 3: all three
    count tables are sum-mergeable (full-outer join + coalesced sum
    per key), so the folded model equals the union-retrained model
    EXACTLY (``incremental_trigram_model_equiv`` gates it). The merge
    cost is vocabulary-type-sized (the trigram-type table dominates),
    never a corpus re-scan."""

    def _merge(x: DataFrame, y: DataFrame, keys: list[str], cnt: str):
        return (
            x.select(*keys, F.col(cnt).alias("__ca"))
            .join(y.select(*keys, F.col(cnt).alias("__cb")), keys, "full_outer")
            .select(
                *keys,
                (
                    F.coalesce("__ca", F.lit(0)) + F.coalesce("__cb", F.lit(0))
                ).alias(cnt),
            )
        )

    return (
        _merge(a[0], b[0], ["w"], "c"),
        _merge(a[1], b[1], ["a", "b"], "c2"),
        _merge(a[2], b[2], ["a", "b", "c"], "c3"),
    )


def bigram_doc_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    train_pred: Column | None = None,
) -> DataFrame:
    """(id, total_micrologp, n_tokens, n_backoff): stupid-backoff bigram
    scores per document. The LM trains on rows matching ``train_pred``
    (default: everything) and scores EVERY row; a document's total is
    U(w₁) + Σᵢ S(wᵢ | wᵢ₋₁) in micro-log units, ``n_backoff`` counts
    backed-off transitions (the observable that the context model is
    actually being exercised).

    Tokenizes ONCE and materializes (``localCheckpoint``): the train
    aggregates and the three scoring branches are otherwise independent
    consumers that each re-run the text scan + regex split — at 100 TB,
    ~7 full corpus passes for one scoring call. The vocab-sized model
    tables stay lazy over the materialized token frame (their remaining
    recomputes overlap inside the one final job; A/B-measured, eagerly
    checkpointing them serialized more than it saved, and a lazy
    ``persist`` was slower still — the InMemoryRelation blocks the
    final job's planning wins)."""
    tok = tok_frame(docs, id_col, text_col).localCheckpoint(eager=True)
    uni, big = bigram_model_tables(docs, id_col, text_col, train_pred, tok=tok)
    return bigram_doc_scores_from_model(
        docs, id_col, text_col, uni, big, tok=tok
    )


def bigram_doc_scores_from_model(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    uni: DataFrame,
    big: DataFrame,
    tok: DataFrame | None = None,
) -> DataFrame:
    """Score every document under an EXPLICIT bigram model — the entry
    point for models reloaded from a versioned artifact table. ``uni``
    is ``(w, c)``, ``big`` is ``(a, b, c2)``; T, the micro-log unigram
    scores and the context totals derive here, so persisted counts are
    the whole model. ``tok`` shares a pre-tokenized ``(id, t)`` frame
    across the scoring branches (see ``tok_frame``)."""
    tok = _tok(docs, id_col, text_col, tok)
    tot = uni.agg(
        (F.sum("c") + F.count(F.lit(1))).cast("double").alias("T")
    )
    um = uni.crossJoin(F.broadcast(tot)).select(
        "w", _mu_log((F.col("c") + 1) / F.col("T")).alias("u")
    )
    ctx = big.groupBy("a").agg(F.sum("c2").alias("c1"))

    # --- scoring rows over the WHOLE corpus ---
    # No broadcast hints on the model tables: at training-corpus scale
    # the bigram-TYPE table can reach billions of rows (unsafe to force
    # onto executors) — AQE converts these equi-joins to broadcast when
    # runtime stats allow, which is the right call at every scale. Only
    # the 1-row total keeps an explicit broadcast.
    oov = _mu_log(F.lit(1.0) / F.col("T"))  # smoothed zero-count unigram
    heads = (
        tok.filter(F.size("t") >= 1)
        .select("id", F.element_at("t", 1).alias("w"))
        .join(um, "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "id",
            F.coalesce(F.col("u"), oov).alias("s"),
            F.lit(0).alias("bo"),
        )
    )
    trans = (
        tok.select("id", F.explode(_pairs(F.col("t"))).alias("p"))
        .select("id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .join(big, ["a", "b"], "left")
        .join(ctx, "a", "left")
        .join(
            um.select(F.col("w").alias("b"), F.col("u").alias("ub")),
            "b",
            "left",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "id",
            F.when(
                F.col("c2").isNotNull(),
                _mu_log(F.col("c2").cast("double") / F.col("c1")),
            )
            .otherwise(F.lit(BACKOFF_MU) + F.coalesce(F.col("ub"), oov))
            .alias("s"),
            F.when(F.col("c2").isNull(), 1).otherwise(0).alias("bo"),
        )
    )
    agg = (
        heads.unionByName(trans)
        .groupBy("id")
        .agg(
            F.sum("s").cast("long").alias("total_micrologp"),
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum("bo").cast("int").alias("n_backoff"),
        )
    )
    return tok.select("id").join(agg, "id", "left").select(
        "id",
        F.coalesce("total_micrologp", F.lit(0).cast("long")).alias(
            "total_micrologp"
        ),
        F.coalesce("n_tokens", F.lit(0).cast("int")).alias("n_tokens"),
        F.coalesce("n_backoff", F.lit(0).cast("int")).alias("n_backoff"),
    )


def _triples(t: Column) -> Column:
    """Adjacent (a, b, c) struct triples of a token array (< 3 → [])."""
    m = F.greatest(F.size(t) - 2, F.lit(0))
    ab = F.zip_with(
        F.slice(t, 1, m),
        F.slice(t, 2, m),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return F.zip_with(
        ab,
        F.slice(t, 3, m),
        lambda p, c: F.struct(
            p["a"].alias("a"), p["b"].alias("b"), c.alias("c")
        ),
    )


def trigram_model_tables(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    train_pred: Column | None = None,
    tok: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The trigram LM's ENTIRE persistable state: the unigram ``(w,
    c)``, bigram ``(a, b, c2)`` and trigram ``(a, b, c, c3)`` count
    tables over the training slice — the three-table generalization of
    ``bigram_model_tables``. T, the micro-log unigram scores and BOTH
    context totals (c(a ·) and c(a b ·)) are pure derivations of these
    counts, so count-persistence is sufficient at order 3 exactly as at
    order 2 (``trigram_model_artifact_roundtrip`` saves these through
    the archive's versioned commit and re-derives the rest on load).
    ``tok`` shares a pre-tokenized ``(id, t)`` frame (``tok_frame``)."""
    tok = _tok(docs, id_col, text_col, tok)
    train = tok.filter(train_pred) if train_pred is not None else tok
    uni = (
        train.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        train.select(F.explode(_pairs(F.col("t"))).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    tri = (
        train.select(F.explode(_triples(F.col("t"))).alias("p"))
        .groupBy(
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
            F.col("p.c").alias("c"),
        )
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    return uni, big, tri


def trigram_doc_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    train_pred: Column | None = None,
) -> DataFrame:
    """(id, total_micrologp, n_tokens, n_backoff2, n_backoff1): order-3
    stupid backoff (Brants 2007 §4 — the production chain order):

        S(c | a b) = count(a b c) / count(a b ·)   if count(a b c) > 0
                   = 0.4 · S(c | b)                otherwise

    with ``S(c | b)`` the bigram rule above, bottoming out at the
    smoothed unigram. A document totals U(w₁) + S(w₂ | w₁) +
    Σᵢ₌₃ S(wᵢ | wᵢ₋₂ wᵢ₋₁). ``n_backoff2`` counts trigram→bigram hops
    (positions ≥ 3 whose trigram was unseen); ``n_backoff1`` counts
    transitions that fell all the way to the UNIGRAM level — the
    position-2 bigram miss plus doubly-backed-off trigram positions —
    so both hops of the chain are witnessed observables. Each hop adds
    one BACKOFF_MU constant, so a doubly-backed-off position scores
    2·BACKOFF_MU + U(c) — still a sum of quantized integers the oracle
    replays exactly.

    Same scale shape as ``bigram_doc_scores`` with one more
    training-slice aggregate (trigram types) and one more type-counted
    join; strategies left to AQE for the same reason. Tokenizes ONCE
    and materializes the token frame; the model tables stay lazy over
    it (same measured trade as ``bigram_doc_scores``)."""
    tok = tok_frame(docs, id_col, text_col).localCheckpoint(eager=True)
    uni, big, tri = trigram_model_tables(
        docs, id_col, text_col, train_pred, tok=tok
    )
    return trigram_doc_scores_from_model(
        docs, id_col, text_col, uni, big, tri, tok=tok
    )


def trigram_doc_scores_from_model(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    uni: DataFrame,
    big: DataFrame,
    tri: DataFrame,
    tok: DataFrame | None = None,
) -> DataFrame:
    """Score every document under an EXPLICIT trigram model — the entry
    point for models reloaded from a versioned artifact table. ``uni``
    is ``(w, c)``, ``big`` is ``(a, b, c2)``, ``tri`` is ``(a, b, c,
    c3)``; T, the micro-log unigram scores and both context totals
    derive here, so the persisted counts are the whole model. ``tok``
    shares a pre-tokenized ``(id, t)`` frame (see ``tok_frame``)."""
    tok = _tok(docs, id_col, text_col, tok)
    tot = uni.agg(
        (F.sum("c") + F.count(F.lit(1))).cast("double").alias("T")
    )
    um = uni.crossJoin(F.broadcast(tot)).select(
        "w", _mu_log((F.col("c") + 1) / F.col("T")).alias("u")
    )
    ctx = big.groupBy("a").agg(F.sum("c2").alias("c1"))
    ctx3 = tri.groupBy("a", "b").agg(F.sum("c3").alias("c23"))

    oov = _mu_log(F.lit(1.0) / F.col("T"))
    # position 1: smoothed unigram
    heads = (
        tok.filter(F.size("t") >= 1)
        .select("id", F.element_at("t", 1).alias("w"))
        .join(um, "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "id",
            F.coalesce(F.col("u"), oov).alias("s"),
            F.lit(0).alias("bo2"),
            F.lit(0).alias("bo1"),
        )
    )
    # position 2: the bigram rule (no trigram context exists yet)
    bscore = F.when(
        F.col("c2").isNotNull(),
        _mu_log(F.col("c2").cast("double") / F.col("c1")),
    ).otherwise(F.lit(BACKOFF_MU) + F.coalesce(F.col("ub"), oov))
    second = (
        tok.filter(F.size("t") >= 2)
        .select(
            "id",
            F.element_at("t", 1).alias("a"),
            F.element_at("t", 2).alias("b"),
        )
        .join(big, ["a", "b"], "left")
        .join(ctx, "a", "left")
        .join(
            um.select(F.col("w").alias("b"), F.col("u").alias("ub")),
            "b",
            "left",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "id",
            bscore.alias("s"),
            F.lit(0).alias("bo2"),
            F.when(F.col("c2").isNull(), 1).otherwise(0).alias("bo1"),
        )
    )
    # positions ≥ 3: the trigram rule, chaining down on misses
    bscore_bc = F.when(
        F.col("c2bc").isNotNull(),
        _mu_log(F.col("c2bc").cast("double") / F.col("c1b")),
    ).otherwise(F.lit(BACKOFF_MU) + F.coalesce(F.col("uc"), oov))
    trans = (
        tok.select("id", F.explode(_triples(F.col("t"))).alias("p"))
        .select(
            "id",
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
            F.col("p.c").alias("c"),
        )
        .join(tri, ["a", "b", "c"], "left")
        .join(ctx3, ["a", "b"], "left")
        .join(
            big.select(
                F.col("a").alias("b"),
                F.col("b").alias("c"),
                F.col("c2").alias("c2bc"),
            ),
            ["b", "c"],
            "left",
        )
        .join(
            ctx.select(F.col("a").alias("b"), F.col("c1").alias("c1b")),
            "b",
            "left",
        )
        .join(
            um.select(F.col("w").alias("c"), F.col("u").alias("uc")),
            "c",
            "left",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "id",
            F.when(
                F.col("c3").isNotNull(),
                _mu_log(F.col("c3").cast("double") / F.col("c23")),
            )
            .otherwise(F.lit(BACKOFF_MU) + bscore_bc)
            .alias("s"),
            F.when(F.col("c3").isNull(), 1).otherwise(0).alias("bo2"),
            F.when(
                F.col("c3").isNull() & F.col("c2bc").isNull(), 1
            )
            .otherwise(0)
            .alias("bo1"),
        )
    )
    agg = (
        heads.unionByName(second)
        .unionByName(trans)
        .groupBy("id")
        .agg(
            F.sum("s").cast("long").alias("total_micrologp"),
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum("bo2").cast("int").alias("n_backoff2"),
            F.sum("bo1").cast("int").alias("n_backoff1"),
        )
    )
    return tok.select("id").join(agg, "id", "left").select(
        "id",
        F.coalesce("total_micrologp", F.lit(0).cast("long")).alias(
            "total_micrologp"
        ),
        F.coalesce("n_tokens", F.lit(0).cast("int")).alias("n_tokens"),
        F.coalesce("n_backoff2", F.lit(0).cast("int")).alias("n_backoff2"),
        F.coalesce("n_backoff1", F.lit(0).cast("int")).alias("n_backoff1"),
    )


def py_trigram_scores(
    rows: list[tuple[int, str | None]],
    train_ids: set[int],
) -> dict[int, tuple[int, int, int, int]]:
    """Brute-force reference twin for pytest pinning:
    id → (total_micrologp, n_tokens, n_backoff2, n_backoff1)."""
    toks = {i: llm_text.py_tokens(t) for i, t in rows}
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    tri: dict[tuple[str, str, str], int] = {}
    ctx3: dict[tuple[str, str], int] = {}
    for i, t in toks.items():
        if i not in train_ids:
            continue
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
        for a, b, c in zip(t, t[1:], t[2:]):
            tri[(a, b, c)] = tri.get((a, b, c), 0) + 1
            ctx3[(a, b)] = ctx3.get((a, b), 0) + 1
    total = sum(uni.values()) + len(uni)
    if total == 0:
        return {
            i: (
                0,
                len(t),
                max(0, len(t) - 2),
                max(0, len(t) - 1),
            )
            for i, t in toks.items()
        }

    def mu(x: float) -> int:
        return math.floor(1e6 * math.log(x) + 0.5)

    def u(w: str) -> int:
        return mu((uni.get(w, 0) + 1) / total)

    def s2(a: str, b: str) -> tuple[int, bool]:
        """Bigram rule: (score, hit-unigram-level)."""
        c2 = big.get((a, b))
        if c2 is not None:
            return mu(c2 / ctx[a]), False
        return BACKOFF_MU + u(b), True

    out: dict[int, tuple[int, int, int, int]] = {}
    for i, t in toks.items():
        if not t:
            out[i] = (0, 0, 0, 0)
            continue
        s = u(t[0])
        nb2 = nb1 = 0
        if len(t) >= 2:
            v, fell = s2(t[0], t[1])
            s += v
            nb1 += int(fell)
        for a, b, c in zip(t, t[1:], t[2:]):
            c3 = tri.get((a, b, c))
            if c3 is not None:
                s += mu(c3 / ctx3[(a, b)])
            else:
                v, fell = s2(b, c)
                s += BACKOFF_MU + v
                nb2 += 1
                nb1 += int(fell)
        out[i] = (s, len(t), nb2, nb1)
    return out


def py_bigram_scores(
    rows: list[tuple[int, str | None]],
    train_ids: set[int],
) -> dict[int, tuple[int, int, int]]:
    """Brute-force reference twin (pure Python, dict counting) for
    pytest pinning: id → (total_micrologp, n_tokens, n_backoff)."""
    toks = {i: llm_text.py_tokens(t) for i, t in rows}
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    for i, t in toks.items():
        if i not in train_ids:
            continue
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    total = sum(uni.values()) + len(uni)
    if total == 0:
        # Degenerate no-model case (training slice has zero tokens):
        # the engine's smoothing total is NULL, every per-token score is
        # NULL, and the per-doc SUM coalesces to 0 with every transition
        # marked backed-off — the DuckDB oracle degenerates identically.
        # Match that totality here instead of dividing by zero.
        return {
            i: (0, len(t), max(0, len(t) - 1)) for i, t in toks.items()
        }

    def mu(x: float) -> int:
        return math.floor(1e6 * math.log(x) + 0.5)

    def u(w: str) -> int:
        return mu((uni.get(w, 0) + 1) / total)

    out: dict[int, tuple[int, int, int]] = {}
    for i, t in toks.items():
        if not t:
            out[i] = (0, 0, 0)
            continue
        s = u(t[0])
        nb = 0
        for a, b in zip(t, t[1:]):
            c2 = big.get((a, b))
            if c2 is not None:
                s += mu(c2 / ctx[a])
            else:
                s += BACKOFF_MU + u(b)
                nb += 1
        out[i] = (s, len(t), nb)
    return out
