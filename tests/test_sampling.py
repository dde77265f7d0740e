"""llm/sampling.py — determinism, rate accuracy, split exhaustiveness,
and epoch-mixing semantics; llm/text.py chunks/scrub_pii edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_scraper_db_spark.llm import sampling
from youtube_scraper_db_spark.llm.text import chunks, scrub_pii


def _ids(spark, n=4000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_sample_rate_and_determinism(spark):
    df = _ids(spark)
    a = sampling.deterministic_sample(df, "doc_id", 0.3)
    n1, n2 = a.count(), sampling.deterministic_sample(df, "doc_id", 0.3).count()
    assert n1 == n2
    assert abs(n1 / 4000 - 0.3) < 0.03
    # nested property: the 10% sample is a subset of the 30% sample
    small = sampling.deterministic_sample(df, "doc_id", 0.1)
    assert small.join(a, "doc_id", "left_anti").count() == 0


def test_split_assign_partitions_everything(spark):
    df = _ids(spark)
    out = sampling.split_assign(
        df, "doc_id", [("train", 0.8), ("valid", 0.1), ("test", 0.1)]
    )
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 4000
    assert abs(counts["train"] / 4000 - 0.8) < 0.03
    assert abs(counts["valid"] / 4000 - 0.1) < 0.02
    assert abs(counts["test"] / 4000 - 0.1) < 0.02


def test_stratified_rates(spark):
    df = _ids(spark).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("zh")
    )
    out = sampling.stratified_sample(df, "doc_id", "lang", {"en": 0.2, "zh": 1.0})
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["zh"] == 2000
    assert abs(counts["en"] / 2000 - 0.2) < 0.04


def test_mix_epochs_factors(spark):
    df = _ids(spark).withColumn(
        "src",
        F.when(F.col("doc_id") % 3 == 0, "a")
        .when(F.col("doc_id") % 3 == 1, "b")
        .otherwise("c"),
    )
    out = sampling.mix_epochs(df, "doc_id", "src", {"a": 2.5, "b": 0.0}, default_factor=1.0)
    counts = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    n_a = df.where("src = 'a'").count()
    assert "b" not in counts  # factor 0 drops the stratum
    assert counts["c"] == df.where("src = 'c'").count()  # factor 1 = identity
    assert abs(counts["a"] / n_a - 2.5) < 0.1
    # epochs are dense 1..k per row
    mx = out.where("src = 'a'").groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("epoch").alias("mx"), F.min("epoch").alias("mn")
    )
    assert mx.where("n != mx OR mn != 1").count() == 0


def test_chunks_cover_text_with_overlap(spark):
    text = "x" * 1050
    row = spark.createDataFrame([(text,)], "text string").select(
        chunks("text", size=500, stride=400).alias("c")
    ).first()
    got = row["c"]
    assert [len(c) for c in got] == [500, 500, 250]
    assert got[0][400:] == got[1][:100]  # 100-char overlap
    empty = spark.createDataFrame([("",)], "text string").select(
        chunks("text").alias("c")
    ).first()
    assert empty["c"] == []


def test_scrub_pii(spark):
    s = "mail a.b+c@ex-y.org or call +1 (555) 012-3456, id 42 stays"
    got = spark.createDataFrame([(s,)], "t string").select(
        scrub_pii("t").alias("s")
    ).first()["s"]
    assert got == "mail [EMAIL] or call [PHONE], id 42 stays"


def test_weighted_sample_prefers_heavy_rows(spark):
    from youtube_scraper_db_spark.llm.sampling import weighted_sample

    # weights: id 0..199 gets weight 1, 200..219 weight 1000 — nearly
    # every heavy row must make a size-40 sample, and reruns agree
    base = spark.range(220).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 200, 1000).otherwise(1).alias("w"),
    )
    s1 = weighted_sample(base, "doc_id", "w", 40)
    picked = {r.doc_id for r in s1.collect()}
    heavy = {i for i in range(200, 220)}
    assert len(heavy & picked) >= 18
    s2 = weighted_sample(base, "doc_id", "w", 40)
    assert picked == {r.doc_id for r in s2.collect()}  # rerun-stable
