"""connected_components (llm/cluster.py): large-star/small-star labels vs
a driver-side union-find, plus the survivor-list semantics."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from youtube_scraper_db_spark.llm.cluster import (
    connected_components,
    dedup_keep_list,
)


def _uf_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to the component minimum
    return {n: find(n) for n in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    want = _uf_labels(edges)
    # both adaptive paths must agree with the reference labels:
    # driver_threshold=0 forces the distributed large-star/small-star
    # loop; the default routes a small measured edge set to the
    # driver-side union-find.
    for threshold in (0, 500_000):
        got = {
            r.node: r.component
            for r in connected_components(
                df, "src", "dst", driver_threshold=threshold
            ).collect()
        }
        # union-find roots are minima because we always parent max under min
        assert got == want, f"threshold={threshold}: {got} != {want}"


def test_chain_collapses_to_one_component(spark):
    # a long path is the worst case for naive propagation
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(40)]
    _check(spark, edges)


def test_multiple_components_and_random_graph(spark):
    rng = random.Random(7)
    edges = []
    for comp in range(6):
        nodes = [f"c{comp}_{i:02d}" for i in range(rng.randint(2, 12))]
        # random spanning tree + extra random edges
        for i, n in enumerate(nodes[1:], 1):
            edges.append((rng.choice(nodes[:i]), n))
        for _ in range(rng.randint(0, 8)):
            edges.append((rng.choice(nodes), rng.choice(nodes)))
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert connected_components(df, "src", "dst").count() == 0


def test_keep_list_one_canonical_per_cluster(spark):
    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(8)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("d5", "d6")], "src string, dst string"
    )
    labels = connected_components(pairs, "src", "dst")
    kept = {
        r.doc_id: r.kept_reason
        for r in dedup_keep_list(docs, "doc_id", labels).collect()
    }
    assert kept == {
        "d0": "unique",
        "d1": "canonical",
        "d4": "unique",
        "d5": "canonical",
        "d7": "unique",
    }
