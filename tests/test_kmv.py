"""KMV / theta sketch properties (operators/kmv.py).

What must hold for the registry gates to be trustworthy:
- bottom-k MERGEABILITY is an exact set identity (merge of part
  sketches == direct sketch), for any split;
- the non-full regime is EXACT (fewer than k distinct keys → the
  sketch IS the key set, estimate == exact count);
- the full-regime estimate lands within the theoretical error band;
- the grouped kernel's per-group sketch equals the global sketch of
  that group's slice (one-scan grouping changes nothing);
- theta set-ops are exact when both sketches are non-full, and the
  intersection estimate tracks the true overlap when full.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from youtube_scraper_db_spark.operators import kmv


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def _hashes(df):
    return sorted(r["h"] for r in df.collect())


def test_nonfull_regime_is_exact(spark):
    df = _keys_df(spark, [f"u{i}" for i in range(20)] * 3)
    est = kmv.kmv_estimate(kmv.kmv_sketch(df, "k", 64), 64).collect()[0]
    assert est["sketch_size"] == 20
    assert est["estimate"] == 20.0


def test_full_regime_estimate_within_band(spark):
    n, k = 1000, 64
    df = _keys_df(spark, [f"user-{i}" for i in range(n)])
    est = kmv.kmv_estimate(kmv.kmv_sketch(df, "k", k), k).collect()[0]
    assert est["sketch_size"] == k
    # std error ~ 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma on fixed data
    assert abs(est["estimate"] - n) / n < 0.5


@pytest.mark.parametrize("mod", [2, 3, 7])
def test_merge_identity_any_split(spark, mod):
    keys = [f"key-{i}" for i in range(300)]
    df = _keys_df(spark, keys)
    k = 32
    direct = kmv.kmv_sketch(df, "k", k)
    parts = [
        kmv.kmv_sketch(
            df.where(F.crc32(F.col("k")) % mod == i), "k", k
        )
        for i in range(mod)
    ]
    merged = parts[0]
    for p in parts[1:]:
        merged = kmv.kmv_merge(merged, p, k)
    assert _hashes(merged) == _hashes(direct)


def test_grouped_matches_per_group_global(spark):
    rows = [(f"g{i % 3}", f"key-{i % 40}") for i in range(200)]
    df = spark.createDataFrame(rows, "g string, k string")
    k = 16
    grouped = kmv.kmv_sketch_grouped(df, "g", "k", k)
    for g in ("g0", "g1", "g2"):
        got = sorted(
            r["h"] for r in grouped.where(F.col("g") == g).collect()
        )
        want = _hashes(kmv.kmv_sketch(df.where(F.col("g") == g), "k", k))
        assert got == want, g


def test_theta_setops_exact_when_nonfull(spark):
    a = _keys_df(spark, [f"x{i}" for i in range(30)])
    b = _keys_df(spark, [f"x{i}" for i in range(20, 50)])
    k = 64
    sa, sb = kmv.kmv_sketch(a, "k", k), kmv.kmv_sketch(b, "k", k)
    # both sketches non-full → theta = 2^60 → samples are the full sets
    inter = sa.join(sb, "h").count()
    union = sa.unionByName(sb).distinct().count()
    assert inter == 10
    assert union == 50


def test_intersection_estimate_tracks_overlap_when_full(spark):
    k = 64
    a = _keys_df(spark, [f"id-{i}" for i in range(800)])
    b = _keys_df(spark, [f"id-{i}" for i in range(400, 1200)])
    sa = kmv.kmv_sketch(a, "k", k)
    sb = kmv.kmv_sketch(b, "k", k)
    theta = min(
        kmv.kmv_theta(sa, k).collect()[0]["theta"],
        kmv.kmv_theta(sb, k).collect()[0]["theta"],
    )
    n_inter = sa.join(sb, "h").where(F.col("h") < theta).count()
    est = n_inter * kmv.KMV_SPACE / theta
    assert abs(est - 400) / 400 < 0.8  # coarse band: k=64 sample, fixed data


def test_kth_hash_is_inclusion_threshold(spark):
    df = _keys_df(spark, [f"z{i}" for i in range(500)])
    k = 32
    sk = kmv.kmv_sketch(df, "k", k)
    hs = _hashes(sk)
    assert len(hs) == k
    # every distinct hash below the kth order statistic was retained
    all_h = sorted(
        r["h"]
        for r in df.select(kmv.kmv_hash(F.col("k")).alias("h"))
        .distinct()
        .collect()
    )
    assert hs == all_h[:k]
