"""Incremental rollup maintenance: batch-order invariance and agreement
with the from-scratch aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_scraper_db_spark.io import read_table
from youtube_scraper_db_spark.pipelines.incremental import (
    read_rollup,
    refresh_rollup,
    rollup_batch,
)

SF = "/root/testdata/sf0.001"


def _canon(df):
    rows = df.select(
        "day",
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("s"),
        F.round("min_value", 2).alias("mn"),
        F.round("max_value", 2).alias("mx"),
    ).collect()
    return sorted((r.day, r.event_type, r.n_events, r.s, r.mn, r.mx) for r in rows)


def test_incremental_equals_full_recompute(spark):
    events = read_table(spark, SF, "events")
    # three arbitrary ingest batches (hash-split so they're uneven)
    b1 = events.where(F.col("event_id") % 3 == 0)
    b2 = events.where(F.col("event_id") % 3 == 1)
    b3 = events.where(F.col("event_id") % 3 == 2)

    r = refresh_rollup(None, b1)
    r = refresh_rollup(r, b2)
    r = refresh_rollup(r, b3)

    assert _canon(r) == _canon(rollup_batch(events))


def test_merge_is_batch_order_invariant(spark):
    events = read_table(spark, SF, "events")
    b1 = events.where(F.col("event_id") % 2 == 0)
    b2 = events.where(F.col("event_id") % 2 == 1)
    fwd = refresh_rollup(refresh_rollup(None, b1), b2)
    rev = refresh_rollup(refresh_rollup(None, b2), b1)
    assert _canon(fwd) == _canon(rev)


def test_read_view_derives_avg(spark):
    events = read_table(spark, SF, "events")
    view = read_rollup(refresh_rollup(None, events))
    row = view.where(F.col("n_events") > 0).first()
    assert abs(row.avg_value - row.sum_value / row.n_events) < 1e-9


def test_incremental_distinct_sketch(spark):
    """Distinct users per (day, type) survive batch splits: the HLL
    sketches union across refreshes and the estimate matches the exact
    distinct count computed from the full history (2% rsd default —
    exact here because per-group cardinalities are tiny)."""
    events = read_table(spark, SF, "events")
    b1 = events.where(F.col("event_id") % 2 == 0)
    b2 = events.where(F.col("event_id") % 2 == 1)
    view = read_rollup(refresh_rollup(refresh_rollup(None, b1), b2))

    exact = (
        events.select(
            F.col("ts").cast("date").alias("day"), "event_type", "user_id"
        )
        .groupBy("day", "event_type")
        .agg(F.countDistinct("user_id").alias("exact_uniq"))
    )
    joined = view.join(exact, ["day", "event_type"]).select(
        "approx_uniq_users", "exact_uniq"
    )
    for r in joined.collect():
        assert abs(r.approx_uniq_users - r.exact_uniq) <= max(
            2, 0.05 * r.exact_uniq
        ), (r.approx_uniq_users, r.exact_uniq)


def test_incremental_ivf_fold_equals_rebuild(spark):
    """Folding a new batch into frozen-centroid inverted lists ==
    rebuilding from scratch — per-row assignment is order-independent
    (round-8 incremental-ANN story, unit scale)."""
    from youtube_scraper_db_spark.llm import similarity as S

    e = read_table(spark, SF, "embeddings")
    cdf = e.filter((F.col("vec_id") < 6) & (F.col("vec_id") % 3 != 2)).select(
        F.col("vec_id").alias("cid"), S.as_double("embedding").alias("cv")
    )
    base = e.filter(F.col("vec_id") % 3 != 2)
    batch = e.filter(F.col("vec_id") % 3 == 2)
    inc = (
        S.ivf_index(base, cdf)
        .unionByName(S.ivf_index(batch, cdf))
        .select("vec_id", "cluster")
    )
    full = S.ivf_index(e, cdf).select("vec_id", "cluster")
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0
    assert inc.count() == e.count()


def test_incremental_pq_encode_equals_reencode(spark):
    """Encoding a new batch with frozen codebooks and unioning onto the
    stored codes == re-encoding the whole corpus."""
    from youtube_scraper_db_spark.llm import similarity as S

    e = read_table(spark, SF, "embeddings").limit(200).localCheckpoint()
    base = e.filter(F.col("vec_id") % 3 != 2)
    batch = e.filter(F.col("vec_id") % 3 == 2)
    books = S.pq_train_codebooks(base, k=8, sample_n=64)

    def canon(df):
        return sorted(
            (r["vec_id"], tuple(r["codes"])) for r in df.collect()
        )

    inc = canon(S.pq_encode(base, books)) + canon(S.pq_encode(batch, books))
    full = canon(S.pq_encode(e, books))
    assert sorted(inc) == full


def test_pq_topk_from_codes_matches_fused_kernel(spark):
    """The stored-codes search path returns the same top-k as the fused
    one-shot pq_ann_topk (same books, same pool)."""
    from youtube_scraper_db_spark.llm import similarity as S

    e = read_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        S.as_double("embedding").alias("qv")
    )
    books = S.pq_train_codebooks(e, k=8, sample_n=128)
    codes = S.pq_encode(e, books)
    split = S.pq_topk_from_codes(codes, e, q, books, k=5, pool=50).collect()
    fused = S.pq_ann_topk(e, q, books, k=5, pool=50).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in split] == [
        (r["vec_id"], r["cos_sim"]) for r in fused
    ]
