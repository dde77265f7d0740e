"""Exact heavy hitters (operators/heavy_hitters.py): the Misra-Gries
candidate pass must never lose a true heavy hitter, whatever the
distribution or partition layout — verified against the orthodox
groupBy on adversarial inputs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from youtube_scraper_db_spark.operators.heavy_hitters import exact_heavy_hitters


def _exact(df, k):
    total = df.count()
    return {
        (r.w, r.cnt)
        for r in df.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(total))
        .collect()
    }


def _check(spark, rows, k, partitions=8):
    df = (
        spark.createDataFrame([(w,) for w in rows], "w string")
        .repartition(partitions)
    )
    got = {(r.w, r.cnt) for r in exact_heavy_hitters(df, "w", k=k).collect()}
    assert got == _exact(df, k)
    return got


def test_skewed_with_rare_noise(spark):
    # 2 heavy keys drowned in 5000 distinct rare keys — the summary
    # overflows constantly; the merge rule must still keep the heavies.
    rng = random.Random(3)
    rows = ["hot1"] * 3000 + ["hot2"] * 2000 + [f"rare{i}" for i in range(5000)]
    rng.shuffle(rows)
    got = _check(spark, rows, k=8)
    assert {w for w, _ in got} == {"hot1", "hot2"}


def test_spread_thin_across_partitions(spark):
    # a heavy hitter evenly smeared over many partitions still exceeds
    # N_p/k somewhere (pigeonhole) — must survive with exact count
    rows = ["thin"] * 1300 + [f"x{i % 900}" for i in range(8700)]
    got = _check(spark, rows, k=8, partitions=16)
    assert ("thin", 1300) in got


def test_no_heavy_hitters_is_empty(spark):
    rows = [f"u{i}" for i in range(2000)]  # all unique
    assert _check(spark, rows, k=16) == set()


def test_boundary_is_strictly_greater(spark):
    # exactly N/k occurrences must NOT qualify (strict >)
    rows = ["edge"] * 25 + [f"y{i}" for i in range(75)]  # 25 * 4 == 100
    got = _check(spark, rows, k=4)
    assert got == set()


def test_recount_exact_with_any_superset(spark):
    """Stage 2 (recount_candidates) gives the exact answer for ANY
    candidate superset — extra never-heavy candidates are filtered by
    the threshold, so the streaming form's update-mode union (a looser
    superset than the final summary) is safe."""
    from youtube_scraper_db_spark.operators.heavy_hitters import (
        recount_candidates,
    )

    rows = ["hot"] * 400 + [f"r{i}" for i in range(600)]
    df = spark.createDataFrame([(w,) for w in rows], "w string")
    superset = spark.createDataFrame(
        [("hot",), ("r0",), ("never-seen",)], "w string"
    )
    got = {
        (r.w, r.cnt, r.n_total)
        for r in recount_candidates(df, superset, "w", 8).collect()
    }
    assert got == {("hot", 400, 1000)}


def test_merge_preserves_superset_and_bound(spark):
    """mg_combine_summaries: merging two halves' summaries (combine +
    one trim) keeps ≤ k-1 slots AND the merged candidate set recounts
    to the exact heavy hitters — the Agarwal invariant
    k·error ≤ N − Σcounters survives the merge, on an adversarial mix
    where each half alone would trim differently."""
    from youtube_scraper_db_spark.operators.heavy_hitters import (
        mg_combine_summaries,
        mg_partition_summaries,
        recount_candidates,
    )

    rng = random.Random(11)
    k = 8
    # 'hot' is heavy only GLOBALLY: each half holds 50% of its mass,
    # smeared among half-local noise that dominates the half's summary.
    rows_a = ["hot"] * 700 + [f"a{i % 300}" for i in range(2300)]
    rows_b = ["hot"] * 700 + [f"b{i % 300}" for i in range(2300)]
    rng.shuffle(rows_a)
    rng.shuffle(rows_b)
    df_a = spark.createDataFrame([(w,) for w in rows_a], "w string").repartition(8)
    df_b = spark.createDataFrame([(w,) for w in rows_b], "w string").repartition(8)
    s_a = mg_combine_summaries(mg_partition_summaries(df_a, "w", k), "w", k)
    s_b = mg_combine_summaries(mg_partition_summaries(df_b, "w", k), "w", k)
    assert s_a.count() <= k - 1 and s_b.count() <= k - 1
    merged = mg_combine_summaries(s_a.unionByName(s_b), "w", k)
    assert merged.count() <= k - 1
    full = df_a.unionByName(df_b)
    got = {
        (r.w, r.cnt)
        for r in recount_candidates(full, merged.select("w"), "w", k).collect()
    }
    assert got == _exact(full, k)
    assert ("hot", 1400) in got


def test_combine_invariant_random(spark):
    """Randomized invariant check: for every value, true_count −
    merged_residual ≤ N/k (the error bound the superset guarantee
    rests on), across partition layouts."""
    from youtube_scraper_db_spark.operators.heavy_hitters import (
        mg_combine_summaries,
        mg_partition_summaries,
    )

    rng = random.Random(23)
    k = 6
    rows = [f"v{rng.randrange(40)}" for _ in range(4000)]
    df = spark.createDataFrame([(w,) for w in rows], "w string").repartition(13)
    summary = mg_combine_summaries(
        mg_partition_summaries(df, "w", k), "w", k
    )
    resid = {r.w: r.cnt for r in summary.collect()}
    true = {r.w: r.cnt for r in df.groupBy("w").agg(F.count("*").alias("cnt")).collect()}
    n = len(rows)
    for w, c in true.items():
        assert c - resid.get(w, 0) <= n / k, (w, c, resid.get(w, 0))


def test_streaming_mg_matches_batch(spark, tmp_path):
    """Cross-micro-batch MG state fold == batch heavy hitters: two
    source files split a heavy hitter's occurrences, so only the
    carried state can see its full count."""
    from youtube_scraper_db_spark.operators.heavy_hitters import (
        recount_candidates,
    )
    from youtube_scraper_db_spark.streaming.heavy_hitters import (
        mg_candidate_stream,
    )

    rows = ["hh"] * 900 + [f"r{i % 400}" for i in range(2100)]
    random.Random(7).shuffle(rows)
    half = len(rows) // 2
    src = tmp_path / "src"
    for tag, part in (("f1", rows[:half]), ("f2", rows[half:])):
        spark.createDataFrame(
            [(w,) for w in part], "w string"
        ).coalesce(1).write.parquet(str(src / tag))

    stream = (
        spark.readStream.schema("w string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    collected: list = []

    def sink(batch, epoch_id):
        collected.extend(batch.collect())

    (
        mg_candidate_stream(stream, "w", k=8, buckets=4)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    cands = spark.createDataFrame(
        [(r.w,) for r in collected], "w string"
    ).distinct()
    df = spark.createDataFrame([(w,) for w in rows], "w string")
    got = {
        (r.w, r.cnt) for r in recount_candidates(df, cands, "w", 8).collect()
    }
    want = _exact(df, 8)
    assert got == want and ("hh", 900) in got


def test_grouped_heavy_hitters_exact_per_group(spark):
    """exact_heavy_hitters_grouped == the orthodox per-group groupBy
    HAVING, on an adversarial mix where each group has different
    hitters and sizes, across partition layouts."""
    import random as _r

    from pyspark.sql import functions as F2

    from youtube_scraper_db_spark.operators.heavy_hitters import (
        exact_heavy_hitters_grouped,
    )

    rng = _r.Random(5)
    rows = (
        [("en", "the")] * 900
        + [("en", f"e{i % 700}") for i in range(2100)]
        + [("zh", "de")] * 300
        + [("zh", f"z{i % 100}") for i in range(400)]
        + [("fr", f"f{i}") for i in range(500)]  # no hitters
    )
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "g string, w string").repartition(11)
    got = {
        (r.g, r.w, r.cnt, r.n_group)
        for r in exact_heavy_hitters_grouped(df, "g", "w", k=8).collect()
    }
    tot = {r.g: r.n for r in df.groupBy("g").agg(F2.count("*").alias("n")).collect()}
    want = {
        (r.g, r.w, r.cnt, tot[r.g])
        for r in df.groupBy("g", "w")
        .agg(F2.count("*").alias("cnt"))
        .collect()
        if r.cnt * 8 > tot[r.g]
    }
    assert got == want
    assert ("en", "the", 900, 3000) in got
    assert ("zh", "de", 300, 700) in got
    assert not any(g == "fr" for g, *_ in got)
