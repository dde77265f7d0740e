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


def test_pagerank_integer_matches_bruteforce(spark):
    """3-iteration integer PR on a hand-checkable graph: a 3-cycle with
    a pendant node and an isolated node — engine == pure-Python fold of
    the same integer recurrence."""
    from youtube_scraper_db_spark.llm.cluster import pagerank_integer

    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    pair_list = [(0, 1), (1, 2), (2, 0), (0, 3)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pair_list] + [(b, a) for a, b in pair_list],
        "src long, dst long",
    )
    got = {
        r["id"]: r["pr"]
        for r in pagerank_integer(nodes, edges, iters=3).collect()
    }

    adj: dict[int, list[int]] = {}
    for a, b in pair_list:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    pr = {v: 1_000_000 for v in range(5)}
    for _ in range(3):
        s = {v: 0 for v in range(5)}
        for u, outs in adj.items():
            c = pr[u] // len(outs)
            for v in outs:
                s[v] += c
        pr = {v: 150_000 + (85 * s[v]) // 100 for v in range(5)}
    assert got == pr
    # the hub (deg 3) outranks cycle members; the isolate sits at the
    # teleport floor
    assert got[0] > got[1] and got[4] == 150_000


def test_pagerank_deterministic_across_partitionings(spark):
    from youtube_scraper_db_spark.llm.cluster import pagerank_integer

    nodes = spark.createDataFrame([(i,) for i in range(60)], "id long")
    pair_list = [(i, (i * 7 + 1) % 60) for i in range(60)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pair_list] + [(b, a) for a, b in pair_list],
        "src long, dst long",
    )
    a = sorted(map(tuple, pagerank_integer(nodes, edges, iters=3).collect()))
    b = sorted(
        map(
            tuple,
            pagerank_integer(
                nodes.repartition(7), edges.repartition(11), iters=3
            ).collect(),
        )
    )
    assert a == b


def test_label_propagation_communities(spark):
    """Two dense triangles joined by one bridge: after 4 synchronous
    rounds each triangle agrees on its min seed; engine matches a pure
    Python fold of the same (count, min-label) argmax recurrence."""
    from youtube_scraper_db_spark.llm.cluster import label_propagation

    nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
    und = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und],
        "src long, dst long",
    )
    got = {
        r["id"]: r["label"]
        for r in label_propagation(nodes, edges, iters=4).collect()
    }

    adj: dict[int, list[int]] = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {v: v for v in range(7)}
    for _ in range(4):
        new = {}
        for v in range(7):
            if v not in adj:
                new[v] = v
                continue
            cnt: dict[int, int] = {}
            for u in adj[v]:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    assert got == lab
    # node 6 is isolated -> keeps its own label
    assert got[6] == 6


def test_fold_components_random_equals_recompute(spark):
    """fold_components(labels(old), new) == connected_components(all),
    over random graphs and random batch splits — on BOTH execution
    paths (driver union-find and the distributed star loop via
    driver_threshold=0)."""
    import random

    from youtube_scraper_db_spark.llm.cluster import (
        connected_components,
        fold_components,
    )

    rng = random.Random(42)
    for trial, thresh in [(0, 500_000), (1, 500_000), (2, 0)]:
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(70)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        cut = len(edges) * 2 // 3
        old_e = spark.createDataFrame(edges[:cut], "a long, b long")
        new_e = spark.createDataFrame(edges[cut:], "a long, b long")
        all_e = spark.createDataFrame(edges, "a long, b long")
        old_lab = connected_components(
            old_e, "a", "b", driver_threshold=thresh
        )
        folded = {
            (r.node, r.component)
            for r in fold_components(
                old_lab, new_e, "a", "b", driver_threshold=thresh
            ).collect()
        }
        full = {
            (r.node, r.component)
            for r in connected_components(
                all_e, "a", "b", driver_threshold=thresh
            ).collect()
        }
        assert folded == full, f"trial {trial}"


def test_fold_components_new_nodes_and_bridges(spark):
    """The fold's hard cases: a new edge BRIDGING two old components
    (labels must merge to the global min), and edges introducing
    brand-new nodes (self-label or join an old component)."""
    from youtube_scraper_db_spark.llm.cluster import (
        connected_components,
        fold_components,
    )

    old_e = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long"
    )
    # bridge 3-10 merges {1,2,3} with {10,11}; 20-21 is all-new;
    # 11-30 attaches new node 30 to an old component
    new_e = spark.createDataFrame(
        [(3, 10), (20, 21), (11, 30)], "a long, b long"
    )
    labels = connected_components(old_e, "a", "b")
    folded = {
        (r.node, r.component)
        for r in fold_components(labels, new_e, "a", "b").collect()
    }
    assert folded == {
        (1, 1), (2, 1), (3, 1), (10, 1), (11, 1), (30, 1),
        (20, 20), (21, 20),
    }
