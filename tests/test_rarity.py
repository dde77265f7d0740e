"""Unigram-LM rarity scoring, TF-IDF extraction, segment dedup and
fixed-point centroids — hand-computable miniatures where every expected
number is derived by hand, plus invariants the synthetic corpus can't
accidentally satisfy."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_scraper_db_spark.llm import dedup as D
from youtube_scraper_db_spark.llm import rarity as R
from youtube_scraper_db_spark.llm import similarity as S

SCALE = R.RARITY_SCALE  # 2^20


def test_unigram_rarity_hand_computed(spark):
    # corpus counts: a→3, b→2, z→1
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b z"), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in R.unigram_rarity(docs, hot_min=3).collect()}
    # doc 1: weights floor(S/3)*2 + floor(S/2); no hapax; min count 2
    w3, w2, w1 = SCALE // 3, SCALE // 2, SCALE
    assert out[1].n_tokens == 3
    assert out[1].rarity_sum == 2 * w3 + w2
    assert out[1].hapax_tokens == 0
    assert out[1].min_word_count == 2
    # doc 2 has the hapax z (corpus count 1 → weight 2^20)
    assert out[2].rarity_sum == w3 + w2 + w1
    assert out[2].hapax_tokens == 1
    assert out[2].min_word_count == 1
    # empty doc survives the left join with zeroed stats
    assert out[3].n_tokens == 0 and out[3].rarity_sum == 0
    assert out[3].mean_rarity == 0.0
    # mean is the truncated ratio
    assert out[2].mean_rarity == int((w3 + w2 + w1) / (3 * SCALE) * 10000) / 10000


def test_unigram_rarity_hot_cold_split_agrees(spark):
    # same answer whichever side of the split each word lands on
    docs = spark.createDataFrame(
        [(i, "common " * 20 + f"rare{i}") for i in range(10)],
        "doc_id long, text string",
    )
    lo = R.unigram_rarity(docs, hot_min=2).orderBy("doc_id").collect()
    hi = R.unigram_rarity(docs, hot_min=10**9).orderBy("doc_id").collect()
    assert lo == hi


def test_tfidf_ranks_distinctive_term_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "shared shared unique1"),
            (2, "shared shared unique2"),
            (3, "shared shared unique3"),
        ],
        "doc_id long, text string",
    )
    out = R.tfidf_top_terms(docs, k=2).collect()
    top = {r.doc_id: r.term for r in out if r.term_rank == 1}
    # df(unique)=1 → idf 3*S; df(shared)=3 → idf S; tf 2 of shared < 3S
    assert top == {1: "unique1", 2: "unique2", 3: "unique3"}
    scores = {(r.doc_id, r.term): r.score for r in out}
    assert scores[(1, "unique1")] == 3 * SCALE
    assert scores[(1, "shared")] == 2 * SCALE


def test_segment_dedup_keeps_first_occurrence(spark):
    block = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, block + " tail1 t t t t t t t t t"), (2, block + " other x"), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in _segment_report(spark, docs).collect()}
    # doc 1 owns the block (first in corpus order); doc 2's copy dropped
    assert out[1].kept_segments == out[1].n_segments == 2
    assert out[2].n_segments == 2 and out[2].kept_segments == 1
    assert out[2].dedup_text == "other x"
    assert out[3].n_segments == 0 and out[3].dedup_text == ""


def _segment_report(spark, docs):
    agg = D.segment_dedup(docs)
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
            F.coalesce("kept_segments", F.lit(0)).alias("kept_segments"),
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
        )
    )


def test_segment_dedup_alignment_sensitivity_documented(spark):
    # fixed windows are alignment-dependent BY DESIGN (the cheap pass);
    # a shifted copy is NOT caught here — that's substring_dup_flags' job
    block = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, block), (2, "pad " + block)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in _segment_report(spark, docs).collect()}
    assert out[2].kept_segments == out[2].n_segments  # misaligned → kept


def test_label_centroids_fixed_point_exact(spark):
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 2.0], 0),
            (2, [2.0, 3.0], 0),
            (3, [10.0, -1.5], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.label: r for r in S.label_centroids(vecs).collect()}
    assert out[0].n_vecs == 2 and out[0].centroid == [1.5, 2.5]
    # floor quantization: -1.5 → -1500/1000 exactly
    assert out[1].centroid == [10.0, -1.5]


def test_tfidf_cosine_pairs_clone_detection(spark):
    """A verbatim clone scores cosine 1.0 against its source; an
    unrelated doc (no shared rare terms) never pairs; stop-terms
    occurring in >N/10 docs carry no weight."""
    from youtube_scraper_db_spark.llm.rarity import tfidf_cosine_pairs

    stop = "the common filler "  # appears in every doc -> pruned
    rows = [(i, stop + f"unique{i} token{i}") for i in range(20)]
    rows[7] = (7, stop + "unique3 token3")  # clone of doc 3's rare part
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in tfidf_cosine_pairs(df, threshold=0.5).collect()
    }
    assert set(got) == {(3, 7)}
    assert got[(3, 7)] == 1.0


def test_tfidf_cosine_pairs_partial_overlap_and_determinism(spark):
    from youtube_scraper_db_spark.llm.rarity import tfidf_cosine_pairs

    rows = [(i, f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(30)]
    rows[1] = (1, "alpha0 beta0 gammaX deltaX")  # half-overlap with doc 0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(tuple, tfidf_cosine_pairs(df, threshold=0.3).collect())
    )
    assert got and got[0][:2] == (0, 1)
    # half the terms shared, but the shared terms' df=2 lowers their
    # idf vs the df=1 uniques -> cosine lands below the unweighted 0.5
    assert 0.3 <= got[0][2] <= 0.5
    again = sorted(
        map(
            tuple,
            tfidf_cosine_pairs(df.repartition(7), threshold=0.3).collect(),
        )
    )
    assert got == again
