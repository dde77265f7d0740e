"""Corpus-frequency language-model scoring — the unigram-LM quality
filter (the classic "does this look like natural text for our corpus"
signal, the cheap stand-in for KenLM perplexity gating) and TF-IDF term
extraction.

Everything is integer-exact by construction so the DuckDB oracle can
match bit-for-bit: rarity weights are ``floor(2^20 / count)`` (IEEE
double division of exact integers, floored — identical in every
engine), scores are integer sums (associative, order-free), and no
transcendental function (log/exp) ever runs, sidestepping libm
divergence between engines entirely.

Scale design (the part that matters at 100 TB): the corpus→vocabulary
aggregation is a map-side-combinable word count; scoring joins every
token occurrence back to its corpus count, and a plain shuffle join
there would reshuffle the whole exploded corpus AND put the heaviest
keys ("the") on single reducers. Instead the vocabulary is split at a
count threshold: frequent words — few distinct, covering almost all
token mass — broadcast, so the bulk of the corpus is scored map-side
with zero shuffle; only the rare tail (many distinct words, few
occurrences each) takes the shuffle join, and by construction that
shuffle contains no heavy key. This is the same heavy-hitter split a
skew-aware optimizer performs, done declaratively.

Reference parity: the reference has no LM scoring (it stores transcripts
verbatim — ref add_transcripts.py:1); this is part of the §2.12
training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import CacheScope, _scope_or_default
from .text import tokens

#: Fixed-point scale for rarity weights: floor(2^20 / corpus_count).
RARITY_SCALE = 1 << 20


def word_occurrences(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per token occurrence: (id, w). The exploded corpus —
    never collected, only aggregated or joined."""
    return docs.select(id_col, F.explode(tokens(text_col)).alias("w"))


def vocabulary(occ: DataFrame) -> DataFrame:
    """Corpus vocabulary with occurrence counts. Map-side combinable
    hash aggregate; output is |vocab| rows, tiny next to the corpus."""
    return occ.groupBy("w").agg(F.count("*").alias("wc"))


def score_terms(tf: DataFrame, vocab: DataFrame, hot_min: int = 64) -> DataFrame:
    """Attach corpus counts to per-(doc, word) term rows via the
    heavy-hitter split: words with count >= hot_min broadcast (few
    distinct, most of the token mass — matched map-side, no shuffle),
    the rare tail shuffle-joined (cheap: every key there occurs <
    hot_min times, so no reducer hot spot). Returns tf + ``wc``."""
    hot = vocab.filter(F.col("wc") >= hot_min)
    cold = vocab.filter(F.col("wc") < hot_min)
    tagged = tf.join(F.broadcast(hot), "w", "left")
    hot_rows = tagged.filter(F.col("wc").isNotNull())
    cold_rows = tagged.filter(F.col("wc").isNull()).drop("wc").join(cold, "w")
    return hot_rows.unionByName(cold_rows)


def unigram_rarity(
    docs: DataFrame, hot_min: int = 64, scope: CacheScope | None = None
) -> DataFrame:
    """Per-document unigram-LM rarity report: token count, integer
    rarity sum (per-token weight floor(2^20 / corpus_count) — high for
    words the corpus has rarely seen), hapax count (tokens whose corpus
    count is 1 — the OOV analog), rarest token's corpus count, and the
    mean rarity in [0, 1] (truncated to 4 decimals). High mean rarity
    flags text that does not look like the corpus — the unigram version
    of a perplexity filter, with no model file and no libm.

    Everything downstream of the corpus works on per-(doc, word) TERM
    rows, not raw occurrences: rarity_sum = Σ tf(doc,w)·weight(w), and
    the vocabulary itself is Σ tf over docs — so the corpus is scanned
    once, the (doc, w) partial-aggregate exchange is the single
    corpus-wide shuffle, and both the vocabulary branch and the scoring
    branch hang off that SAME exchange. The tf posting list is PERSISTED
    (CacheScope, the module-wide pin-lifetime pattern): branch-specific
    filter pushdown makes the two exchanges non-identical so
    ReuseExchange alone cannot collapse them, and materializing tf —
    orders of magnitude smaller than the corpus — is exactly what a
    production pipeline does with a posting list."""
    scope = _scope_or_default(scope)
    tf = scope.persist(
        word_occurrences(docs)
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    vocab = tf.groupBy("w").agg(F.sum("tf").alias("wc"))
    scored = score_terms(tf, vocab, hot_min)
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.sum(F.col("tf") * F.floor(F.lit(float(RARITY_SCALE)) / F.col("wc")))
        .cast("long")
        .alias("rarity_sum"),
        F.sum(F.when(F.col("wc") == 1, F.col("tf")).otherwise(0))
        .cast("long")
        .alias("hapax_tokens"),
        F.min("wc").alias("min_word_count"),
    )
    joined = docs.select("doc_id").join(per_doc, "doc_id", "left")
    n = F.coalesce(F.col("n_tokens"), F.lit(0))
    rs = F.coalesce(F.col("rarity_sum"), F.lit(0))
    mean = F.floor(
        rs / (F.greatest(n, F.lit(1)) * F.lit(float(RARITY_SCALE))) * 10000
    ) / 10000.0
    return joined.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        rs.cast("long").alias("rarity_sum"),
        F.coalesce(F.col("hapax_tokens"), F.lit(0)).cast("long").alias("hapax_tokens"),
        F.coalesce(F.col("min_word_count"), F.lit(0)).cast("long").alias("min_word_count"),
        mean.alias("mean_rarity"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    hot_min: int = 64,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF, integer-
    exact: idf weight = floor(2^20 * n_docs / doc_frequency) (rank-
    equivalent to the log form for ordering within a fixed corpus),
    score = term_frequency * idf_weight — an exact integer, so ranking
    ties are real ties and the (score DESC, term ASC) tie-break makes
    the top-k total-ordered and engine-portable.

    Shape: tf is a per-(doc, word) count; df is a count-distinct-docs
    per word (both map-side-combinable); df joins back via the same
    heavy-hitter split as scoring; the final top-k is a rank window
    partitioned by doc — no global sort."""
    scope = _scope_or_default(scope)
    occ = word_occurrences(docs)
    tf = scope.persist(occ.groupBy("doc_id", "w").agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("w").agg(F.count("*").alias("wc"))
    n_docs = docs.count()
    scored = score_terms(tf, df_, hot_min).withColumnRenamed("wc", "df")
    idf_w = F.floor(F.lit(float(RARITY_SCALE * n_docs)) / F.col("df"))
    ranked = scored.select(
        "doc_id",
        "w",
        (F.col("tf") * idf_w).cast("long").alias("score"),
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("w"))
        ),
    )
    return (
        ranked.filter(F.col("rnk") <= k)
        .select(
            "doc_id",
            F.col("rnk").alias("term_rank"),
            F.col("w").alias("term"),
            "score",
        )
    )


def vocab_coverage(
    docs: DataFrame,
    cuts: tuple[int, ...] = (10, 100, 1000),
    scope: CacheScope | None = None,
) -> DataFrame:
    """Token-mass coverage of the top-``k`` vocabulary head for each cut
    — the tokenizer-budget curve ("how much of the corpus do the N most
    frequent words cover?"). Computed WITHOUT a global rank window: each
    cut is an ``orderBy(count desc, word).limit(k)`` — Spark plans that
    as TakeOrderedAndProject (per-partition heaps + a k-row merge on the
    driver), so no single reducer ever holds the whole vocabulary; the
    (count desc, word) total order makes boundary ties deterministic.
    The vocabulary itself is persisted once (|vocab| rows — the ideal
    cache), so the corpus is scanned once however many cuts are asked.

    Columns: (k, covered_tokens, total_tokens, coverage)."""
    from functools import reduce

    scope = _scope_or_default(scope)
    vc = scope.persist(vocabulary(word_occurrences(docs)))
    total = vc.agg(F.sum("wc").cast("long").alias("total_tokens"))
    parts = [
        vc.orderBy(F.desc("wc"), F.asc("w"))
        .limit(k)
        .agg(F.sum("wc").cast("long").alias("covered_tokens"))
        .select(F.lit(k).cast("int").alias("k"), "covered_tokens")
        for k in cuts
    ]
    curve = reduce(lambda a, b: a.unionByName(b), parts)
    return curve.crossJoin(total).select(
        "k",
        "covered_tokens",
        "total_tokens",
        (
            F.floor(
                F.col("covered_tokens")
                / F.col("total_tokens").cast("double")
                * 10000
            )
            / 10000.0
        ).alias("coverage"),
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_df_frac: int = 10,
    max_df_abs: int = 256,
    idf_scale: int = 1000,
) -> DataFrame:
    """Sparse TF-IDF document-similarity pairs via an INVERTED INDEX —
    the fuzzy-dedup path that needs no embeddings (the classic sparse
    all-pairs formulation, Elsayed et al. 2008): ``(doc_a, doc_b,
    cos_sim)`` for every pair whose TF-IDF cosine ≥ ``threshold``.

    Exactness device: per-(doc, term) weights are INTEGERS — ``w = tf ·
    floor(idf_scale · ln(N / df) + 0.5)`` — so the pair dot product is
    an integer sum (associative, order-free, oracle-exact); only the
    final normalization divides by the (deterministic) double norms and
    rounds to 4dp, the embedding-cosine convention. ``idf_scale`` keeps
    products safely inside int64: w ≤ tf · idf_scale·ln(N) ≈ 1e6 at
    corpus scale, so a pair's sum stays < 2^63 up to ~1e6 shared terms.

    Scale shape — the prune is TWO-SIDED, and both cuts are needed:
    terms occurring in more than ``N / max_df_frac`` documents are cut
    (stop-words carry no discriminative idf mass — the semantic
    choice), AND terms on inverted lists longer than ``max_df_abs``
    documents are cut (the COST guard: a term's pair fan-out is df², so
    the absolute cap bounds total candidate work to O(|terms|·cap²) —
    linear in vocabulary — whatever the corpus's growth pattern). The
    relative cut alone is NOT a cost bound: when a corpus grows by
    adding disjoint vocabularies (new domains/languages — exactly the
    ×20 scale probe's replication model), every term's df/N ratio
    FALLS while its list length stays put, the relative prune admits
    everything, and pair generation degenerates toward all-pairs —
    measured 2682× at ×20 volume before the cap existed
    (SCALE_PROBE.md round 8). Similarity is defined over the pruned
    term space — norms included — and the oracle replays both cuts.
    Pair partials then combine map-side into one keyed integer sum."""
    occ = word_occurrences(docs, id_col, text_col)
    # materialized: tf feeds the document-frequency aggregate AND the
    # kept-term weight join — lazy, the tokenize+explode+count pipeline
    # (the only corpus-sized work here) runs once per consumer; the r13
    # scan sweep measured this query at 12 corpus scans before the two
    # cuts below (tf, then the pruned wt for norms + both join sides)
    tf = occ.groupBy(F.col(id_col).alias("d"), "w").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=True)
    n_docs = docs.select(
        F.countDistinct(id_col).cast("double").alias("n")
    )
    df_t = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        df_t.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") * max_df_frac <= F.col("n"))
            & (F.col("df") <= max_df_abs)
        )
        .select(
            "w",
            F.floor(
                F.lit(float(idf_scale)) * F.log(F.col("n") / F.col("df"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("qidf"),
        )
    )
    wt = tf.join(kept, "w").select(
        "d", "w", (F.col("tf") * F.col("qidf")).alias("wq")
    ).localCheckpoint(eager=True)
    norms = wt.groupBy("d").agg(
        F.sqrt(F.sum(F.col("wq") * F.col("wq"))).alias("nrm")
    )
    a = wt.select(F.col("d").alias("doc_a"), "w", F.col("wq").alias("wa"))
    b = wt.select(F.col("d").alias("doc_b"), "w", F.col("wq").alias("wb"))
    dots = (
        a.join(b, "w")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    return (
        dots.join(norms.select(F.col("d").alias("doc_a"),
                               F.col("nrm").alias("na")), "doc_a")
        .join(norms.select(F.col("d").alias("doc_b"),
                           F.col("nrm").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
