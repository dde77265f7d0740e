"""The `Corpus`/`Vectors` facade: default routes must be the subquadratic
plans (VERDICT r1: the exact O(n²) twins must never be what an
archive-level API routes to), with ``exact=True`` as the validation
opt-in."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from youtube_scraper_db_spark.llm import Corpus, Vectors
from youtube_scraper_db_spark.llm import similarity as S


def _docs(spark, n=40):
    rng = random.Random(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(30))) for i in range(n)
    ]
    rows += [(i + 1000, t) for i, t in rows[:10]]  # 10 exact clones
    return spark.createDataFrame(rows, "doc_id long, text string")


def _emb(spark, n=60, dim=16):
    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    rows += [(i + 1000, v) for i, v in rows[:15]]  # 15 exact clones
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_corpus_exact_dedup_keeps_canonicals(spark):
    c = Corpus(_docs(spark))
    kept = {r.doc_id for r in c.exact_dedup().select("doc_id").collect()}
    assert set(range(40)) <= kept          # lowest-id copy survives
    assert kept & {i + 1000 for i in range(10)} == set()


def test_corpus_default_near_dup_route_is_lsh_with_clone_recall(spark):
    c = Corpus(_docs(spark))
    pairs = c.near_dup_text_pairs(threshold=0.9)
    clones = {(r.doc_a, r.doc_b) for r in pairs.collect() if r.doc_a + 1000 == r.doc_b}
    assert clones == {(i, i + 1000) for i in range(10)}
    assert "similarity" in pairs.columns   # unified name across routes
    exact = c.near_dup_text_pairs(threshold=0.9, exact=True)
    assert "similarity" in exact.columns


def test_corpus_drop_near_dups_lowest_id_wins(spark):
    c = Corpus(_docs(spark))
    kept = {r.doc_id for r in c.drop_near_dups(threshold=0.95).collect()}
    for i in range(10):
        assert i in kept and (i + 1000) not in kept


def test_vectors_default_near_dups_has_no_cartesian_plan(spark):
    v = Vectors(_emb(spark), dim=16)
    plan = v.near_dups(threshold=0.99)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    exact_plan = (
        v.near_dups(threshold=0.99, exact=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the opt-in baseline IS the pair-space join — sanity that the flag routes
    assert "CartesianProduct" in exact_plan or "BroadcastNestedLoopJoin" in exact_plan


def test_vectors_default_near_dups_subset_of_exact_with_clone_recall(spark):
    v = Vectors(_emb(spark), dim=16)
    approx = {(r.vec_a, r.vec_b) for r in v.near_dups(threshold=0.99).collect()}
    exact = {(r.vec_a, r.vec_b) for r in v.near_dups(threshold=0.99, exact=True).collect()}
    assert approx <= exact
    assert {(i, i + 1000) for i in range(15)} <= approx


def test_vectors_ann_topk_routes(spark):
    e = _emb(spark)
    v = Vectors(e, dim=16)
    q = e.filter(F.col("vec_id") == 0).select(S.as_double("embedding").alias("qv"))
    exact = [r.vec_id for r in v.ann_topk(q, k=5, exact=True).collect()]
    ivf = [r.vec_id for r in v.ann_topk(q, k=5, n_centroids=8).collect()]
    km = [r.vec_id for r in v.ann_topk(q, k=5, n_centroids=8, kmeans_iters=2).collect()]
    assert 0 in ivf and 1000 in ivf
    assert 0 in km and 1000 in km
    assert len(set(exact) & set(ivf)) >= 3


def test_corpus_clustered_drop_keeps_one_per_cluster(spark):
    c = Corpus(_docs(spark))
    kept = {r.doc_id for r in c.drop_near_dups(threshold=0.95, clustered=True).collect()}
    for i in range(10):
        assert i in kept and (i + 1000) not in kept
    # clustered semantics: every doc either kept or in a cluster whose min is kept
    labels = {r.node: r.component for r in c.dup_clusters(threshold=0.95).collect()}
    for node, comp in labels.items():
        assert (node in kept) == (node == comp)


def test_corpus_split_sample_mix_are_deterministic(spark):
    c = Corpus(_docs(spark))
    s1 = {(r.doc_id, r.split) for r in c.split().collect()}
    s2 = {(r.doc_id, r.split) for r in c.split().collect()}
    assert s1 == s2 and len(s1) == 50
    assert c.sample(0.5).count() < 50
    mixed = Corpus(c.split(), text_col="text").mix_epochs("split", {"train": 2.0})
    train_n = sum(1 for _, s in s1 if s == "train")
    assert mixed.where("split = 'train'").count() == 2 * train_n


def test_corpus_chunks_and_scrub_and_pack(spark):
    c = Corpus(_docs(spark))
    ch = c.chunks(size=50, stride=40)
    assert ch.where("length(chunk_text) > 50").count() == 0
    assert ch.count() >= 50
    assert c.scrubbed().count() == 50
    packed = c.packed(capacity=64)
    assert packed.count() == 50
    overflow = packed.groupBy("bin_id").agg(F.sum("packed_len").alias("s")).where("s > 64")
    assert overflow.count() == 0


def test_corpus_rarity_tfidf_segment_routes(spark):
    c = Corpus(_docs(spark))
    r = c.rarity()
    assert r.count() == 50 and "mean_rarity" in r.columns
    t = c.tfidf_terms(k=2)
    assert t.groupBy("doc_id").count().where("count > 2").count() == 0
    sd = c.segment_dedup()
    row = sd.agg(F.sum("kept_segments").alias("k"), F.sum("n_segments").alias("n")).first()
    assert 0 < row.k <= row.n


def test_vectors_centroids_route(spark):
    emb = _emb(spark).withColumn("label", (F.col("vec_id") % 2).cast("int"))
    out = Vectors(emb, dim=16).centroids()
    rows = {r.label: r for r in out.collect()}
    assert set(rows) == {0, 1}
    assert all(len(r.centroid) == 16 for r in rows.values())
