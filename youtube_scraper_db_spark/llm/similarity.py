"""Similarity search over embedding columns (``array<float>``).

- ``cosine``        : pure Column expression (F.zip_with + F.aggregate dot
                      product in double precision — JVM-side, no UDF).
- ``cosine_topk``   : brute-force scan baseline — one pass, k-row result
                      via TakeOrderedAndProject; at 100 TB this is the
                      exact-recall fallback and the re-rank stage.
- ``knn_join``      : small query set × big corpus via broadcast cross
                      join + per-query top-k window.
- ``lsh_ann``       : random-hyperplane LSH — signature is map-only, the
                      probe is an equality join on buckets, re-rank exact.
                      The scale path: touches only the matching buckets.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.topk import top_k_per_group


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision (deterministic
    accumulation order — oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    emb: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k of one query vector against the corpus.
    ``query_df`` must be a single row ``(qv: array<double>)``; it is
    broadcast so the corpus scan stays shuffle-free."""
    scored = emb.crossJoin(F.broadcast(query_df)).select(
        F.col(id_col),
        F.round(cosine(as_double(vec_col), F.col("qv")), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def knn_join(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors for every query row (brute force; broadcast the
    query side). Output: (query_id, cand_id, cos_sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("cand_id"), as_double(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("cv"), F.col("qv")), 4).alias("cos_sim"),
        )
    )
    ranked = top_k_per_group(
        scored,
        ["query_id"],
        [F.desc("cos_sim"), F.asc("cand_id")],
        k,
        rank_col="rank",
        keep_rank=True,
    )
    return ranked.withColumn("rank", F.col("rank").cast("int"))


def unit(vec: Column) -> Column:
    """L2-normalized copy of a double array."""
    n = F.sqrt(_dot(vec, vec))
    return F.transform(vec, lambda x: x / n)


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold. Exact formulation — correct at
    test scale; ``lsh_near_dup_pairs`` is the 100 TB path.

    Each side is unit-normalized ONCE before the pair join (n normalize
    ops), so every candidate pair costs a single dot product instead of
    three — the dominant cost in an O(n²) stage."""
    a = emb.select(F.col(id_col).alias("vec_a"), unit(as_double(vec_col)).alias("ua"))
    b = emb.select(F.col(id_col).alias("vec_b"), unit(as_double(vec_col)).alias("ub"))
    scored = a.join(b, F.col("vec_a") < F.col("vec_b")).select(
        "vec_a", "vec_b", _dot(F.col("ua"), F.col("ub")).alias("raw")
    )
    return scored.filter(F.col("raw") >= threshold).select(
        "vec_a", "vec_b", F.round("raw", 4).alias("cos_sim")
    )


def lsh_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.4,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Subquadratic near-dup pairs: hyperplane-signature buckets prune the
    pair space to within-bucket candidates, then the exact cosine filter
    runs only on those. Recall < 1 by construction (a near-dup pair
    landing in different buckets is missed) and rises with fewer planes /
    multi-probe; at 100 TB the equality join on ``bucket`` shuffles each
    vector once, versus the exact form's O(n²) pair stream."""
    planes = hyperplanes(dim, n_planes, seed)
    sig = emb.select(
        F.col(id_col),
        unit(as_double(vec_col)).alias("uv"),
        lsh_signature(as_double(vec_col), planes).alias("bucket"),
    )
    a = sig.select(
        F.col(id_col).alias("vec_a"), F.col("uv").alias("ua"), "bucket"
    )
    b = sig.select(
        F.col(id_col).alias("vec_b"), F.col("uv").alias("ub"), "bucket"
    )
    scored = (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", _dot(F.col("ua"), F.col("ub")).alias("raw"))
    )
    return scored.filter(F.col("raw") >= threshold).select(
        "vec_a", "vec_b", F.round("raw", 4).alias("cos_sim")
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for signature hashing."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign pattern of the vector against each hyperplane, packed into a
    long — a map-only expression (no UDF, no shuffle)."""
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(x) for x in p])) > 0, F.lit(1 << i)).otherwise(0)
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def ivf_ann_topk(
    emb: DataFrame,
    query_df: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into ``n_centroids`` inverted
    lists, probe the ``nprobe`` lists nearest the query, exact re-rank
    inside them.

    Seed centroids are the vectors with the ``n_centroids`` smallest ids —
    deterministic, so the whole pipeline is oracle-reproducible. At 100 TB
    you'd swap in k-means|| centroids, which changes ONLY the collect
    below: the cluster assignment stays a map-side projection (centroid
    literals folded into the scan, zero shuffle), and the probe stays a
    broadcast semi-join that prunes the exact re-rank to roughly
    ``nprobe/n_centroids`` of the corpus. Scores are rounded to 6dp before
    the argmax so the assignment tie-break (first/lowest centroid id) is
    engine-independent."""
    cents = (
        emb.filter(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("cid"), as_double(vec_col).alias("cv"))
        .orderBy("cid")
        .collect()
    )
    # Python-side sequential sum matches the engines' left-fold dot product.
    norms = [math.sqrt(sum(x * x for x in r.cv)) for r in cents]

    base = emb.select(F.col(id_col), as_double(vec_col).alias("v")).withColumn(
        "vn", F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    scores = F.array(
        *[
            F.round(
                _dot(F.col("v"), F.array(*[F.lit(x) for x in r.cv]))
                / (F.col("vn") * F.lit(n)),
                6,
            )
            for r, n in zip(cents, norms)
        ]
    )
    assigned = base.withColumn(
        "cluster",
        F.element_at(
            F.array(*[F.lit(int(r.cid)) for r in cents]),
            F.array_position(scores, F.array_max(scores)).cast("int"),
        ),
    )

    cdf = emb.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), as_double(vec_col).alias("cv")
    )
    probe = (
        cdf.crossJoin(F.broadcast(query_df))
        .select("cid", F.round(cosine(F.col("cv"), F.col("qv")), 6).alias("qc"))
        .orderBy(F.desc("qc"), F.asc("cid"))
        .limit(nprobe)
        .select("cid")
    )
    probed = assigned.join(
        F.broadcast(probe), assigned["cluster"] == probe["cid"], "left_semi"
    )
    return (
        probed.crossJoin(F.broadcast(query_df))
        .select(
            F.col(id_col),
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (F.col("vn") * F.sqrt(_dot(F.col("qv"), F.col("qv")))),
                4,
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def lsh_ann_topk(
    emb: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: bucket by hyperplane signature, probe the query's bucket, exact
    re-rank inside it. At scale the bucket equality join prunes the corpus
    scan to ~corpus/2^planes vectors; recall is tuned by n_planes and
    multi-probe (flipping low-confidence bits — left as the obvious
    extension)."""
    planes = hyperplanes(dim, n_planes)
    corpus = emb.select(
        F.col(id_col),
        as_double(vec_col).alias("cv"),
        lsh_signature(as_double(vec_col), planes).alias("bucket"),
    )
    q = query_df.select(
        F.col("qv"), lsh_signature(F.col("qv"), planes).alias("qbucket")
    )
    probed = corpus.join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket"), "inner"
    ).select(
        F.col(id_col),
        F.round(cosine(F.col("cv"), F.col("qv")), 4).alias("cos_sim"),
    )
    return probed.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)
