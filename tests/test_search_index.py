"""Trigram search index (operators/search_index.py) vs naive contains,
and local clustering coefficients (llm/cluster.py) vs brute force."""

from __future__ import annotations

import itertools
import random

import pyspark.sql.functions as F

from youtube_scraper_db_spark.llm.cluster import local_clustering, triangle_stats
from youtube_scraper_db_spark.operators.search_index import (
    trigram_postings,
    trigram_search,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_search_equals_naive_contains(spark):
    rnd = random.Random(3)
    words = ["spark", "scan", "row", "vector", "merge", "slow", "agg"]
    texts = [
        " ".join(rnd.choice(words) for _ in range(rnd.randint(0, 12)))
        for _ in range(80)
    ]
    df = _docs(spark, texts)
    for needle in ["slow vector", "merge", "vector m", "xyz"]:
        got = sorted(
            r["doc_id"]
            for r in trigram_search(df, "doc_id", "text", needle).collect()
        )
        want = sorted(i for i, t in enumerate(texts) if needle in t)
        assert got == want, needle


def test_search_handles_nulls_and_short_text(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "ab"), (2, "abcd"), (3, "zabcz")],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"] for r in trigram_search(df, "doc_id", "text", "abc").collect()
    )
    assert got == [2, 3]


def test_postings_dedup_within_doc(spark):
    df = _docs(spark, ["aaaa"])  # grams: aaa at offsets 1,2 → ONE posting
    rows = trigram_postings(df, "doc_id", "text").collect()
    assert len(rows) == 1 and rows[0]["gram"] == "aaa"


def _brute_lcc(edges):
    import collections

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        t = sum(
            1 for p, q in itertools.combinations(sorted(nb), 2) if q in adj[p]
        )
        out[v] = (d, t, round(2.0 * t / (d * (d - 1)), 6))
    return out


def test_local_clustering_vs_brute(spark):
    rnd = random.Random(11)
    nodes = list(range(30))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rnd.choice(nodes), rnd.choice(nodes)) for _ in range(120)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: (r["degree"], r["triangles"], r["lcc"])
        for r in local_clustering(df).collect()
    }
    assert got == _brute_lcc(edges)
    # global count consistency: sum of per-node triangles = 3 * total
    st = triangle_stats(df).collect()[0]
    assert sum(t for _, t, _ in got.values()) == 3 * st["n_triangles"]


def test_triangle_stats_known_graphs(spark):
    # K4: 4 triangles, every lcc = 1
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4, "doc_a long, doc_b long")
    st = triangle_stats(df).collect()[0]
    assert st["n_triangles"] == 4
    assert st["global_cc"] == 1.0
    lcc = {r["node"]: r["lcc"] for r in local_clustering(df).collect()}
    assert lcc == {n: 1.0 for n in range(4)}
    # star: no triangles, cc 0
    star = [(0, i) for i in range(1, 6)]
    df2 = spark.createDataFrame(star, "doc_a long, doc_b long")
    st2 = triangle_stats(df2).collect()[0]
    assert st2["n_triangles"] == 0 and st2["global_cc"] == 0.0
