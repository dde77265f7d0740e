"""LLM-pipeline operators: dedup recall on known clones, similarity
agreement between exact and approximate paths."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from youtube_scraper_db_spark.llm import dedup as D
from youtube_scraper_db_spark.llm import similarity as S

random.seed(7)
WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
         "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi"]


def _corpus(spark, n_docs=30, doc_len=40):
    """n distinct docs + one exact clone of each (ids shifted by 1000)."""
    rows = []
    for i in range(n_docs):
        text = " ".join(random.choice(WORDS) for _ in range(doc_len))
        rows.append((i, text))
        rows.append((i + 1000, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_flags_group_clones(spark):
    c = _corpus(spark)
    out = D.exact_dedup_flags(c, "doc_id", "text")
    assert out.filter("dup_count >= 2").count() >= 60  # every clone pair grouped
    # exactly one canonical per fingerprint group
    per_group = out.groupBy("content_fp").agg(
        F.sum("is_canonical").alias("canon")
    )
    assert per_group.filter("canon != 1").count() == 0


def test_jaccard_pairs_find_all_clones(spark):
    c = _corpus(spark)
    pairs = D.jaccard_pairs(c, "doc_id", "text", k=3, threshold=0.9)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    for i in range(30):
        assert (i, i + 1000) in got  # exact algorithm: recall 1 on clones
    assert all(r.jaccard == 1.0 for r in pairs.collect() if r.doc_a + 1000 == r.doc_b)


def test_minhash_lsh_full_recall_on_clones(spark):
    c = _corpus(spark)
    pairs = D.minhash_lsh_pairs(c, "doc_id", "text", num_hashes=32, bands=16)
    clones = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in pairs.collect()
        if r.doc_a + 1000 == r.doc_b
    }
    # identical shingle sets → identical signatures → every band collides
    assert {(a, b) for a, b, _ in clones} == {(i, i + 1000) for i in range(30)}
    assert all(e == 1.0 for _, _, e in clones)


def test_simhash_clones_hamming_zero(spark):
    c = _corpus(spark)
    sig = D.simhash_signatures(c, "doc_id", "text")
    pairs = D.simhash_bucket_pairs(sig, prefix_bits=16)
    clone_h = {r.hamming for r in pairs.collect() if r.doc_a + 1000 == r.doc_b}
    assert clone_h == {0}


def _embeddings(spark, n=80, dim=16):
    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    rows += [(i + 1000, vec) for i, vec in rows[:20]]  # 20 exact clones
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_near_dups_subset_of_exact_with_clone_recall(spark):
    e = _embeddings(spark)
    exact = {
        (r.vec_a, r.vec_b)
        for r in S.near_dup_pairs(e, threshold=0.99).collect()
    }
    approx = {
        (r.vec_a, r.vec_b)
        for r in S.lsh_near_dup_pairs(e, dim=16, threshold=0.99, n_planes=4).collect()
    }
    assert approx <= exact  # LSH never invents pairs
    # identical vectors share every hyperplane sign → full clone recall
    assert {(i, i + 1000) for i in range(20)} <= approx


def test_lsh_ann_topk_contains_query_clone(spark):
    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") == 0).select(
        S.as_double("embedding").alias("qv")
    )
    hits = [r.vec_id for r in S.lsh_ann_topk(e, q, dim=16, k=5, n_planes=4).collect()]
    assert 0 in hits and 1000 in hits  # query and its clone bucket together


def test_ivf_ann_topk_recall_vs_brute_force(spark):
    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") == 0).select(
        S.as_double("embedding").alias("qv")
    )
    exact = [r.vec_id for r in S.cosine_topk(e, q, k=5).collect()]
    approx = [
        r.vec_id
        for r in S.ivf_ann_topk(e, q, n_centroids=8, nprobe=4, k=5).collect()
    ]
    # query + its exact clone live in the same (probed) list → always found
    assert 0 in approx and 1000 in approx
    # probing half the lists must recover most of the exact top-k
    assert len(set(exact) & set(approx)) >= 3


def test_kmeans_centroids_deterministic_unit_and_recall(spark):
    e = _embeddings(spark)
    km1 = {r.cid: r.cv for r in S.kmeans_centroids(e, n_centroids=8, n_iter=2).collect()}
    km2 = {r.cid: r.cv for r in S.kmeans_centroids(e, n_centroids=8, n_iter=2).collect()}
    assert km1 == km2  # 9dp rounding absorbs distributed-sum jitter
    assert set(km1) == set(range(8))
    for cv in km1.values():
        assert abs(sum(x * x for x in cv) - 1.0) < 1e-6  # unit-normalized
    q = e.filter(F.col("vec_id") == 0).select(
        S.as_double("embedding").alias("qv")
    )
    exact = [r.vec_id for r in S.cosine_topk(e, q, k=5).collect()]
    km_df = S.kmeans_centroids(e, n_centroids=8, n_iter=2)
    approx = [
        r.vec_id
        for r in S.ivf_ann_topk(
            e, q, n_centroids=8, nprobe=4, k=5, centroids=km_df
        ).collect()
    ]
    assert 0 in approx and 1000 in approx  # clone pair never separates
    assert len(set(exact) & set(approx)) >= 3


def test_ivf_assignment_covers_corpus(spark):
    """Every vector lands in exactly one inverted list; probing ALL lists
    reproduces the brute-force top-k exactly (recall → 1 as nprobe → K)."""
    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") == 0).select(
        S.as_double("embedding").alias("qv")
    )
    exact = [(r.vec_id, r.cos_sim) for r in S.cosine_topk(e, q, k=10).collect()]
    full = [
        (r.vec_id, r.cos_sim)
        for r in S.ivf_ann_topk(e, q, n_centroids=8, nprobe=8, k=10).collect()
    ]
    assert full == exact


def test_dedup_cache_scope_does_not_leak(spark):
    """Repeated jaccard/minhash calls must not grow the session's persisted
    RDD set: the module-default CacheScope releases the previous call's
    pins at each new call (VERDICT r1 anti-pattern #2)."""
    c = _corpus(spark, n_docs=5, doc_len=10)
    sizes = []
    for _ in range(3):
        D.jaccard_pairs(c, "doc_id", "text", k=3, threshold=0.9).count()
        D.minhash_lsh_pairs(c, "doc_id", "text", num_hashes=16, bands=8).count()
        sizes.append(spark.sparkContext._jsc.getPersistentRDDs().size())
    # No-growth, not equality: Spark's async ContextCleaner unpersists
    # RDDs whose DataFrames were garbage-collected, so the absolute
    # count can legitimately SHRINK between iterations when the suite
    # shares one session (flaked in the round-5 full run, passes alone).
    # A leak is strictly monotone growth; that is what this pins.
    assert sizes[2] <= sizes[1], f"persisted-RDD count grows: {sizes}"

    # explicit scope: caller releases everything after the terminal action
    scope = D.CacheScope()
    D.jaccard_pairs(c, "doc_id", "text", k=3, threshold=0.9, scope=scope).count()
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    scope.release()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after < before


def test_multiprobe_lsh_ann_recall_at_least_single_probe(spark):
    """1-bit multi-probe must recover at least the single-probe recall at
    equal n_planes (it probes a superset of the buckets)."""
    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") == 0).select(
        S.as_double("embedding").alias("qv")
    )
    exact = {r.vec_id for r in S.cosine_topk(e, q, k=5).collect()}
    single = {
        r.vec_id
        for r in S.lsh_ann_topk(e, q, dim=16, k=5, n_planes=6, probe_bits=0).collect()
    }
    multi = {
        r.vec_id
        for r in S.lsh_ann_topk(e, q, dim=16, k=5, n_planes=6, probe_bits=1).collect()
    }
    assert len(multi & exact) >= len(single & exact)
    assert 0 in multi and 1000 in multi


def test_multiprobe_near_dup_pairs_superset(spark):
    """probe_bits=1 pair output must contain every single-probe pair and
    stay a subset of the exact twin (precision 1 by construction)."""
    e = _embeddings(spark)
    exact = {
        (r.vec_a, r.vec_b) for r in S.near_dup_pairs(e, threshold=0.9).collect()
    }
    p0 = {
        (r.vec_a, r.vec_b)
        for r in S.lsh_near_dup_pairs(
            e, dim=16, threshold=0.9, n_planes=6, probe_bits=0
        ).collect()
    }
    p1 = {
        (r.vec_a, r.vec_b)
        for r in S.lsh_near_dup_pairs(
            e, dim=16, threshold=0.9, n_planes=6, probe_bits=1
        ).collect()
    }
    assert p0 <= p1 <= exact


def test_simhash_signature_stability(spark):
    """The vectorized kernel must produce the documented md5-vote
    signatures (regression pin for the numpy rewrite)."""
    assert D._simhash64("") == 0
    # frequency weighting: repeated token == summed votes, not distinct-set
    a = D._simhash64("alpha alpha beta")
    b = D._simhash64("alpha beta")
    assert isinstance(a, int) and isinstance(b, int)
    sig = D.simhash_signatures(
        spark.createDataFrame([(1, "alpha alpha beta"), (2, "alpha beta"), (3, "")],
                              "doc_id long, text string"),
        "doc_id", "text",
    )
    got = {r.doc: r.simhash for r in sig.collect()}
    assert got == {1: a, 2: b, 3: 0}


def test_decontamination_flags_finds_planted_leak(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains a 5-gram from the benchmark (leaked)
            (1, "intro words then the quick brown fox jumps and more text"),
            # shares 4-gram at most (below k) — clean
            (2, "quick brown fox jumps elsewhere entirely different tail"),
            (3, "completely unrelated content with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.shared_grams, r.matched_bench_docs)
        for r in D.decontamination_flags(corpus, bench, "doc_id", "text", k=5).collect()
    }
    assert got == {1: (1, 1)}


def test_decontamination_clean_corpus_is_empty(spark):
    bench = spark.createDataFrame([(1, "alpha beta gamma delta epsilon zeta")],
                                  "doc_id long, text string")
    corpus = spark.createDataFrame([(2, "one two three four five six")],
                                   "doc_id long, text string")
    assert D.decontamination_flags(corpus, bench, "doc_id", "text", k=5).count() == 0


def test_max_run_length_and_bigrams(spark):
    from youtube_scraper_db_spark.llm import text as T

    rows = [
        (0, "a a a b b c"),      # mode 'a' ×3; bigram "a a" ×2 of 5
        (1, "x y x y x"),        # mode ×3 unsorted→sorted; "x y" ×2 of 4
        (2, "solo"),             # single token: no bigrams
        (3, ""),                 # empty: everything 0
        (4, "t t t t"),          # all same: top frac 1, "t t" ×3 of 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = T.tokens("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            T.max_run_length(F.array_sort(tok)).alias("topw"),
            T.max_run_length(
                F.array_sort(T.bigrams_of_tokens(tok))
            ).alias("topb"),
            F.size(T.bigrams_of_tokens(tok)).alias("nbi"),
        ).collect()
    }
    assert (out[0]["topw"], out[0]["topb"], out[0]["nbi"]) == (3, 2, 5)
    assert (out[1]["topw"], out[1]["topb"], out[1]["nbi"]) == (3, 2, 4)
    assert (out[2]["topw"], out[2]["topb"], out[2]["nbi"]) == (1, 0, 0)
    assert (out[3]["topw"], out[3]["topb"], out[3]["nbi"]) == (0, 0, 0)
    assert (out[4]["topw"], out[4]["topb"], out[4]["nbi"]) == (4, 3, 3)


def test_quantize_int8_exact_ints_and_recall(spark):
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q8 = df.select(
        "vec_id", S.quantize_int8(S.as_double("embedding")).alias("q")
    )
    import math

    for r in q8.collect():
        for v in r["q"]:
            assert v == math.floor(v) and abs(v) <= 127  # exact int8 range
        assert max(abs(v) for v in r["q"]) == 127  # scale hits the max slot
    # quantized top-5 must broadly agree with the exact float top-5
    qdf = df.filter("vec_id = 0").select(F.col("embedding").alias("qv"))
    exact = {r["vec_id"] for r in S.cosine_topk(df, qdf, k=5).collect()}
    quant = {r["vec_id"] for r in S.quantized_cosine_topk(df, qdf, k=5).collect()}
    assert len(quant) == 5
    assert len(exact & quant) >= 4


def test_substring_dup_flags_catches_misaligned_copy(spark):
    """A 120-char literal block pasted into two otherwise-distinct
    documents at DIFFERENT offsets must flag both docs (content-defined
    sampling is alignment-independent); unrelated docs stay unflagged."""
    block = "the quick brown fox jumps over the lazy dog " * 3  # 135 chars
    rows = [
        (1, "left padding words here. " + block + " tail one"),
        (2, "completely different and much longer preamble text " + block),
        (3, "independent document with no shared content at all " * 4),
        (4, "another standalone text that repeats nothing from others " * 4),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: r["n_shared_grams"] for r in
           D.substring_dup_flags(df, "doc_id", "text").collect()}
    assert 1 in out and 2 in out, out
    assert out[1] >= 1 and out[2] >= 1
    assert 3 not in out and 4 not in out


def test_pq_codebooks_deterministic_and_recall(spark):
    import numpy as np

    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b1 = S.pq_train_codebooks(df, m=4, k=8, sample_n=200, iters=5)
    b2 = S.pq_train_codebooks(df, m=4, k=8, sample_n=200, iters=5)
    assert b1.shape == (4, 8, 4)
    assert np.array_equal(b1, b2)  # bit-for-bit repeatable
    qdf = df.filter("vec_id = 0").select(F.col("embedding").alias("qv"))
    exact = [r["vec_id"] for r in S.cosine_topk(df, qdf, k=5).collect()]
    got = [r["vec_id"] for r in
           S.pq_ann_topk(df, qdf, b1, k=5, pool=60).collect()]
    assert len(got) == 5
    assert got[0] == 0  # the query itself survives coarse+re-rank
    assert len(set(exact) & set(got)) >= 4


def test_char_pairs_and_bpe_weighting(spark):
    """char_pairs enumerates adjacent 2-grams; the BPE pair count must
    weight pairs by WORD frequency (vocabulary-collapse-then-explode),
    not recount the corpus."""
    from youtube_scraper_db_spark.llm import text as T

    df = spark.createDataFrame([("ab",), ("abc",), ("xy",)], "w string")
    got = {r["w"]: r["p"] for r in df.select("w", T.char_pairs("w").alias("p")).collect()}
    assert got["ab"] == ["ab"]
    assert got["abc"] == ["ab", "bc"]
    assert got["xy"] == ["xy"]

    # corpus "ab ab abc" → wf {ab:2, abc:1} → pair counts ab:3, bc:1
    docs = spark.createDataFrame([(0, "ab ab abc"), (1, "")], "doc_id long, text string")
    words = (
        docs.select(F.explode(T.tokens("text")).alias("w0"))
        .select(F.lower("w0").alias("w"))
        .filter(F.col("w").rlike("^[a-z]{2,}$"))
    )
    wf = words.groupBy("w").agg(F.count("*").alias("f"))
    counts = {
        r["pair"]: r["n"]
        for r in wf.select(F.explode(T.char_pairs("w")).alias("pair"), "f")
        .groupBy("pair")
        .agg(F.sum("f").alias("n"))
        .collect()
    }
    assert counts == {"ab": 3, "bc": 1}


def test_token_runs_udtf_emits_runs_only(spark):
    """The lateral UDTF emits one row per consecutive run of length ≥2,
    1-based positions; empty/None text and run-free docs emit nothing."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, start_pos bigint, run_len bigint")
    class TokenRuns:
        def eval(self, text):
            toks = text.split() if text else []
            i = 0
            while i < len(toks):
                j = i
                while j < len(toks) and toks[j] == toks[i]:
                    j += 1
                if j - i >= 2:
                    yield toks[i], i + 1, j - i
                i = j

    spark.udtf.register("token_runs_t", TokenRuns)
    spark.createDataFrame(
        [(0, "a a a b c c"), (1, "x y z"), (2, ""), (3, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("runs_docs")
    rows = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT d.doc_id, r.token, r.start_pos, r.run_len "
            "FROM runs_docs d, LATERAL token_runs_t(d.text) r"
        ).collect()
    )
    assert rows == [(0, "a", 1, 3), (0, "c", 5, 2)]


def test_portable_hash_family_matches_python_md5(spark):
    """The portable MinHash family — the two 60-bit md5 halves and the
    Kirsch-Mitzenmacher seeded mix — must equal the literal Python/SQL
    arithmetic the DuckDB oracle replays."""
    import hashlib

    df = spark.createDataFrame([("alpha",), ("beta gamma",)], "s string")
    h1c, h2c = D._portable_h1h2(F.col("s"))
    rows = {
        r["s"]: r
        for r in df.select(
            "s",
            h1c.alias("h1"),
            h2c.alias("h2"),
            D._portable_mix(h1c, h2c, 5).alias("m5"),
        ).collect()
    }
    for s in ("alpha", "beta gamma"):
        hx = hashlib.md5(s.encode()).hexdigest()
        h1, h2 = int(hx[:15], 16), int(hx[16:31], 16)
        assert rows[s]["h1"] == h1 and rows[s]["h2"] == h2
        assert rows[s]["m5"] == (h1 + 5 * h2) % (1 << 60)


def test_portable_hyperplanes_deterministic_and_bounded():
    """Portable planes: md5-derived, in [-0.5, 0.5), stable across calls
    (no RNG), distinct across (plane, dim)."""
    a = S.portable_hyperplanes(8, 4)
    b = S.portable_hyperplanes(8, 4)
    assert a == b
    flat = [x for row in a for x in row]
    assert all(-0.5 <= x < 0.5 for x in flat)
    assert len(set(flat)) == len(flat)


def test_portable_minhash_full_recall_on_clones(spark):
    """The portable (md5) MinHash family keeps the clone-recall property
    of the xxhash64 default: identical texts → identical signatures →
    every clone pair surfaces at est_jaccard 1.0."""
    base = spark.createDataFrame(
        [(i, f"doc number {i} has words {i * 3} and {i * 7} inside") for i in range(20)],
        "doc_id long, text string",
    )
    corpus = base.unionByName(
        base.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    )
    pairs = D.minhash_lsh_pairs(
        corpus, "doc_id", "text", num_hashes=32, bands=16, portable=True
    )
    clones = {
        (r["doc_a"], r["doc_b"])
        for r in pairs.filter(F.col("est_jaccard") >= 0.999).collect()
    }
    for i in range(20):
        assert (i, i + 1000) in clones


def test_lsh_index_decomposition_equals_fused_pipeline(spark):
    """The round-10 refactor contract on the PRODUCTION (xxhash64) hash
    family, which no oracle replays: minhash_band_table +
    lsh_pairs_from_index over a signature table must reproduce
    minhash_lsh_pairs exactly, and the band table must be a pure
    per-doc function (index of a union == union of the indexes — the
    property the persisted-index fold gates rely on)."""
    random.seed(11)
    words = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(random.choice(words) for _ in range(30)))
        for i in range(60)
    ]
    rows += [(100 + i, rows[i][1]) for i in range(10)]  # 10 exact clones
    df = spark.createDataFrame(rows, "doc_id long, text string")

    fused = D.minhash_lsh_pairs(df, "doc_id", "text", num_hashes=16, bands=8)
    sig = D.minhash_signatures(df, "doc_id", "text", num_hashes=16)
    bands = D.minhash_band_table(sig, num_hashes=16, bands=8)
    composed = D.lsh_pairs_from_index(bands, sig, num_hashes=16)
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, composed.collect()))
    assert a == b and len(a) >= 10

    # fold property: band rows of a doc subset are exactly the full
    # index restricted to those docs (banding has no cross-doc state)
    part = df.filter(F.col("doc_id") % 2 == 0)
    sig_p = D.minhash_signatures(part, "doc_id", "text", num_hashes=16)
    bands_p = D.minhash_band_table(sig_p, num_hashes=16, bands=8)
    full_restricted = bands.join(
        part.select(F.col("doc_id").alias("doc")), "doc", "left_semi"
    )
    assert sorted(map(tuple, bands_p.collect())) == sorted(
        map(tuple, full_restricted.collect())
    )
