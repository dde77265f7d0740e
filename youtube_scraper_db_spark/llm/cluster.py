"""Distributed connected components — duplicate *pairs* → duplicate
*clusters*.

The LSH/MinHash/Jaccard stages (llm/dedup.py) emit near-duplicate PAIRS;
an actual dedup pass needs the transitive closure of those pairs — the
connected components of the similarity graph — so that {A~B, B~C}
collapses to one cluster {A,B,C} with one canonical survivor, not two
overlapping pairs.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
shuffle-based CC formulation:

- large-star(u): every neighbor v > u re-points to min(N(u) ∪ {u});
- small-star(u): u and every neighbor v < u re-point to min of the
  smaller neighborhood.

Both rounds are one groupBy-min + one join each — pure keyed shuffles,
no global ordering, no driver-side graph. Converges in O(log² n) rounds
(2-4 in practice for dedup graphs, whose components are small and
dense); at convergence the edge set IS the star map node → component
minimum. Each iteration is ``localCheckpoint``-ed: iterative Spark plans
otherwise grow lineage exponentially and re-execute every prior round.

Per-iteration driver work is two scalar aggregates (count + hash
checksum) for the convergence test — O(1) rows, the legitimate control
plane of an iterative algorithm, never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canon(edges: DataFrame) -> DataFrame:
    """Drop self-loops, canonicalize to (a < b), dedup."""
    a, b = F.col("a"), F.col("b")
    return (
        edges.where(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    """(row count, order-insensitive content hash) — the convergence test."""
    r = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("a", "b") % F.lit(2**31)), F.lit(0)
        ).alias("h"),
    ).first()
    return r["n"], r["h"]


def _union_find_local(edges: DataFrame) -> DataFrame:
    """Driver-side union-find for a SMALL measured edge set.

    Near-dup graphs are usually tiny relative to the corpus (most docs
    match nothing), but each distributed large-star/small-star iteration
    still pays ~6 full shuffle-stage round-trips — seconds of fixed
    overhead to label a few hundred edges. Once the edge count (already
    measured for the convergence test) is known to be bounded, path-
    compressed union-find on the driver is exact, O(E α(E)), and bounded
    in memory by the same threshold that routed us here — the identical
    adaptive trade Spark itself makes when runtime stats turn a
    sort-merge join into a broadcast. Arrow both ways: ``toPandas`` in,
    ``createDataFrame(pdf)`` out; no per-row Python/JVM chatter."""
    import pandas as pd

    pdf = edges.toPandas()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf["a"], pdf["b"]):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:  # attach the larger root under the smaller:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    labels = pd.DataFrame(
        [(n, find(n)) for n in parent], columns=["node", "component"]
    )
    return edges.sparkSession.createDataFrame(
        labels,
        schema=T.StructType(
            [
                T.StructField("node", edges.schema["a"].dataType),
                T.StructField("component", edges.schema["a"].dataType),
            ]
        ),
    )


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
    driver_threshold: int = 500_000,
) -> DataFrame:
    """Labels ``(node, component)`` for every vertex of the undirected
    edge list, where ``component`` is the minimum vertex id (by the
    column's natural ordering) of the node's connected component. Roots
    label themselves; isolated vertices (absent from ``edges``) are the
    caller's to union in.

    Adaptive strategy: the initial canonicalized edge COUNT (computed
    anyway for the convergence checksum) picks the execution path —
    ≤ ``driver_threshold`` edges run driver-side union-find (bounded by
    the threshold: ~16 B/edge, so the default caps the collect at ~8 MB);
    anything larger runs the shuffle-based large-star/small-star loop,
    whose per-iteration cost is what a billion-edge graph needs and what
    a 500-edge graph must not pay."""
    cur = _canon(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    ).localCheckpoint(eager=True)
    prev_sig = _checksum(cur)
    if prev_sig[0] == 0:
        return cur.select(F.col("a").alias("node"), F.col("b").alias("component"))
    if prev_sig[0] <= driver_threshold:
        return _union_find_local(cur)

    for _ in range(max_iter):
        # Symmetrize: every (u, nbr) incidence in both directions.
        sym = cur.unionAll(cur.select(F.col("b").alias("a"), F.col("a").alias("b")))

        # large-star: neighbors larger than u attach to u's overall min.
        mins = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        large = (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )

        # small-star over the large-star output: u and its smaller
        # neighbors attach to the smaller-neighborhood min.
        lsym = _canon(large)
        lsym = lsym.unionAll(
            lsym.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        smalls = lsym.where(F.col("b") < F.col("a"))
        smins = smalls.groupBy("a").agg(F.min("b").alias("m"))
        small = smalls.join(smins, "a").select(
            F.col("b").alias("a"), F.col("m").alias("b")
        ).unionAll(smins.select(F.col("a"), F.col("m").alias("b")))

        cur = _canon(small).localCheckpoint(eager=True)
        sig = _checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig

    # At convergence the canonical (least, greatest) edges ARE the star
    # map: `a` is the component minimum (center), `b` the leaf. Centers
    # self-label; they never appear on the leaf side.
    leaves = cur.select(F.col("b").alias("node"), F.col("a").alias("component"))
    centers = (
        cur.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    return leaves.unionAll(centers)


def fold_components(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str,
    dst: str,
    driver_threshold: int = 500_000,
) -> DataFrame:
    """Fold a NEW edge batch into existing component ``(node,
    component)`` labels WITHOUT re-reading the old edge set — the graph
    member of the incremental-maintenance family (sketches merge
    cell-wise, ANN indexes fold row-wise, LM models fold count-wise,
    components fold by CONTRACTION).

    Steps: (1) relabel both endpoints of the new edges through the
    existing labels (two keyed joins against the label table — nodes
    the old graph never saw keep themselves); (2) run connected
    components on that CONTRACTED label-graph — its size is bounded by
    the NEW batch (≤ 2·|batch| touched labels), not the corpus, so the
    adaptive driver-side union-find almost always takes it; (3) map
    every old label through the resulting merge map (left join +
    coalesce — labels untouched by the batch keep themselves), and
    self-label batch nodes the old labels didn't cover.

    Exactness: contracting a graph's components to single vertices
    preserves the connectivity the new edges induce, and because every
    existing component is labeled by its MINIMUM member, the minimum
    over merged labels IS the minimum over all member nodes — so folded
    labels equal a full recompute on (old ∪ new) edges exactly
    (``incremental_cc_equiv`` gates this). At 100 TB this is the daily
    dedup-graph operation: yesterday's labels are a table, today's
    pairs are a batch, and the fold costs two keyed joins over the
    batch plus CC on the contracted (batch-bounded) graph."""
    lab = labels.select("node", "component")
    e = new_edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    lu = lab.select(F.col("node").alias("u"), F.col("component").alias("cu"))
    lv = lab.select(F.col("node").alias("v"), F.col("component").alias("cv"))
    contracted = (
        e.join(lu, "u", "left")
        .join(lv, "v", "left")
        .select(
            F.coalesce("cu", F.col("u")).alias("a"),
            F.coalesce("cv", F.col("v")).alias("b"),
        )
    )
    merge_map = connected_components(
        contracted, "a", "b", driver_threshold=driver_threshold
    ).select(
        F.col("node").alias("component"),
        F.col("component").alias("__new_component"),
    )
    batch_nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
    )
    fresh = batch_nodes.join(lab.select("node"), "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    base = lab.unionByName(fresh)
    return base.join(merge_map, "component", "left").select(
        "node",
        F.coalesce("__new_component", "component").alias("component"),
    )


def dedup_keep_list(
    docs: DataFrame, id_col: str, labels: DataFrame
) -> DataFrame:
    """Survivor set after near-dup clustering: the minimum-id canonical
    doc of every cluster plus every doc that matched no pair. Returns
    ``(id_col, kept_reason ∈ {'canonical','unique'})``."""
    canonical = (
        labels.select(F.col("component").alias(id_col))
        .distinct()
        .withColumn("kept_reason", F.lit("canonical"))
    )
    unique = (
        docs.select(id_col)
        .join(labels.select(F.col("node").alias(id_col)), id_col, "left_anti")
        .withColumn("kept_reason", F.lit("unique"))
    )
    return canonical.unionAll(unique)


def pagerank_integer(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    iters: int = 3,
    init_micro: int = 1_000_000,
    teleport_micro: int = 150_000,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Integer-quantized PageRank over the similarity graph — the
    iterative-graph sibling of connected components that RANKS inside a
    component instead of collapsing it (centrality picks the canonical
    survivor / surfaces hub documents in a near-dup cluster).

    Determinism contract: ranks live in integer micro-units and every
    operation is integer — ``r₀(v) = init``, ``r_{i+1}(v) = teleport +
    (85 · Σ_{u→v} (r_i(u) div deg(u))) div 100`` — so distributed
    accumulation order cannot move a value and a SQL oracle replays the
    whole iteration chain exactly (the float formulation would drift at
    1e-16 per sum). Dangling mass is dropped, not redistributed (the
    contribution-sum / Pregel formulation); isolated nodes hold the
    teleport floor.

    Scale shape: ``edges`` is the (already subquadratic) near-dup pair
    list expanded to both directions; each iteration is one keyed join
    + one keyed sum — the Pregel superstep as two exchanges. The edge
    list is materialized ONCE up front (it is usually the lazy tail of
    a whole candidate-generation pipeline, and both the degree
    aggregate and the per-degree join consume it — without the cut that
    pipeline runs twice), and the degree-annotated ``ed`` frame is
    materialized because every superstep re-joins it. The per-round
    rank frames are NOT checkpointed: each is consumed exactly once (by
    the next round), ``iters`` is fixed and small (dedup graphs have
    tiny diameter; the gate checks values, not convergence), so the
    bounded 3-round chain runs as ONE fused job instead of iters+1
    serialized materialization jobs — measured faster at bench scale
    and strictly fewer passes at 100 TB."""
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
    ids = nodes.select(F.col(node_col).alias("id"))
    r = ids.select("id", F.lit(init_micro).cast("long").alias("pr"))
    for _ in range(iters):
        contrib = ed.join(r, ed["src"] == r["id"]).select(
            F.col("dst").alias("id"), F.expr("pr div deg").alias("ct")
        )
        sums = contrib.groupBy("id").agg(F.sum("ct").alias("s"))
        r = (
            ids.join(sums, "id", "left")
            .select(
                "id",
                F.coalesce("s", F.lit(0)).alias("s2"),
            )
            .select(
                "id",
                (
                    F.lit(teleport_micro)
                    + F.expr(f"({damp_num} * s2) div {damp_den}")
                )
                .cast("long")
                .alias("pr"),
            )
        )
    return r


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    iters: int = 4,
) -> DataFrame:
    """Synchronous label propagation over the similarity graph — the
    community-detection member of the iterative-graph trio (CC
    collapses components, PageRank ranks inside them, LPA finds the
    dense regions a component's bridges connect).

    Determinism contract: seeds are the node ids; each round every node
    SYNCHRONOUSLY adopts the most frequent label among its neighbors,
    ties broken by the SMALLEST label (argmax over (count, -label)
    structs — a total order, so no engine can disagree), isolated
    nodes keep their own label. Fixed ``iters``; synchronous LPA can
    2-cycle on bipartite structures, which is fine here because the
    output contract is the exact label vector after ``iters`` rounds
    (hash-checked), not a convergence claim — the same
    fixed-iteration-exactness trade as ``pagerank_integer``.

    Scale shape: one keyed join + one (dst, label) count + one argmax
    aggregate per round — Pregel supersteps as exchanges. The label
    frames are NOT checkpointed per round: each is consumed exactly
    once (by the next round's vote join) and ``iters`` is fixed and
    small, so the bounded chain runs as ONE fused job instead of iters
    serialized materialization jobs (the same argument as
    ``pagerank_integer``; the iterative-lineage trap only bites when
    iteration count is unbounded or a frame fans out)."""
    ids = nodes.select(F.col(node_col).alias("id"))
    # materialize the edge list ONCE: it is usually the lazy tail of a
    # whole candidate-generation pipeline (LSH banding + cosine verify),
    # and without the cut every superstep would re-run that pipeline —
    # measured 12.3 s → ~5 s at sf0.1 (the same per-iteration lineage
    # discipline as pagerank_integer's ed frame)
    edges = edges.localCheckpoint(eager=True)
    lab = ids.select("id", F.col("id").alias("label"))
    for _ in range(iters):
        votes = (
            edges.join(lab, edges["src"] == lab["id"])
            .groupBy(F.col("dst").alias("vid"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = votes.groupBy("vid").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl")))
            .alias("b")
        ).select("vid", (-F.col("b.nl")).alias("new_label"))
        lab = (
            ids.join(best, ids["id"] == best["vid"], "left")
            .select(
                "id",
                F.coalesce("new_label", F.col("id")).alias("label"),
            )
        )
    return lab


def triangle_stats(edges: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Triangle count + global clustering coefficient of an undirected
    edge list — the graph-density diagnostic completing the iterative
    trio (CC collapses, PageRank ranks, LPA partitions; this MEASURES
    how clique-like the near-dup neighborhoods are, the signal that
    separates template families from chance collisions).

    Scale shape (the classic MapReduce triangle algorithm, Suri &
    Vassilvitskii WWW'11): orient each edge from its lower-(degree, id)
    endpoint to the higher one — an ACYCLIC orientation under a total
    order, so every triangle has exactly one vertex with two out-edges
    and is counted exactly ONCE however the order is chosen; degree
    ordering specifically bounds every out-degree by O(√m), which caps
    the wedge join's blowup on skewed (hub-heavy) graphs where id
    ordering would explode. Count = wedges (out-edge ⋈ out-edge on the
    middle vertex) semi-joined against the oriented edge set. Because
    the COUNT is orientation-invariant, the oracle replays it with the
    simpler canonical a<b<c three-way join and must agree exactly.

    Emits exact-integer n_nodes / n_edges / n_triangles / wedge2
    (Σ d·(d−1), twice the wedge count) and the global clustering
    coefficient 6·T / wedge2 (≡ 3·T / wedges) rounded at 6dp."""
    e = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)  # reused by degrees + 3 join sides
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=True)
    w1 = o.select(F.col("src").alias("m"), F.col("dst").alias("p"))
    w2 = o.select(F.col("src").alias("m"), F.col("dst").alias("q"))
    wedges = w1.join(w2, "m").where(F.col("p") < F.col("q"))
    # a wedge (p ← m → q) closes iff (p,q) is an oriented edge in
    # EITHER direction — orientation of the closing edge is free
    closing = o.select(
        F.least("src", "dst").alias("p"), F.greatest("src", "dst").alias("q")
    )
    tri = wedges.select(
        F.least("p", "q").alias("p"), F.greatest("p", "q").alias("q")
    ).join(closing, ["p", "q"], "left_semi")
    stats = (
        tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .crossJoin(e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        .crossJoin(deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.col("d") * (F.col("d") - 1)).cast("long").alias("wedge2"),
        ))
    )
    return stats.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "wedge2",
        F.when(
            F.col("wedge2") > 0,
            F.round(
                F.lit(6.0) * F.col("n_triangles").cast("double")
                / F.col("wedge2").cast("double"),
                6,
            ),
        ).alias("global_cc"),
    )


def local_clustering(edges: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Per-node triangle counts + local clustering coefficient — the
    node-grained companion of ``triangle_stats``: lcc(v) = closed
    wedges at v / possible wedges at v = 2·t_v / (d_v·(d_v−1)), the
    standard "is this node inside a clique or a hub?" signal (template
    families score ≈1, bridge documents score ≈0).

    Same degree-ordered orientation as ``triangle_stats`` (out-degrees
    capped at O(√m) under hub skew), but the wedge⋈closing-edge join
    keeps the full (m, p, q) triple — each triangle surfaces exactly
    once (its order-minimum vertex owns the wedge) — and explodes to
    its three corners for one per-node count. Nodes of degree < 2 are
    excluded (lcc undefined). All counts exact integers; lcc rounds at
    6dp from an exact-int ratio."""
    e = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=True)
    w1 = o.select(F.col("src").alias("m"), F.col("dst").alias("p"))
    w2 = o.select(F.col("src").alias("m"), F.col("dst").alias("q"))
    wedges = w1.join(w2, "m").where(F.col("p") < F.col("q"))
    closing = o.select(
        F.least("src", "dst").alias("p"), F.greatest("src", "dst").alias("q")
    ).distinct()
    tri = wedges.join(closing, ["p", "q"], "inner")  # (m, p, q) triples
    corners = (
        tri.select(F.col("m").alias("x"))
        .unionAll(tri.select(F.col("p").alias("x")))
        .unionAll(tri.select(F.col("q").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    return (
        deg.where(F.col("d") >= 2)
        .join(corners, "x", "left")
        .select(
            F.col("x").alias("node"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("triangles"),
            F.round(
                F.lit(2.0) * F.coalesce(F.col("t"), F.lit(0)).cast("double")
                / (F.col("d") * (F.col("d") - 1)).cast("double"),
                6,
            ).alias("lcc"),
        )
    )
