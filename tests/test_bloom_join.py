"""Explicit Bloom runtime-filter join pruning (operators/bloom_join.py).

Exactness is the operator's contract: the pruned join must be
row-identical to the plain join on any input (no false negatives), with
the false-positive leak bounded and eliminated by the join itself. The
plan tests pin the placement that matters at 100 TB — the membership
predicate evaluates against the broadcast 1-row mask BEFORE the
equi-join, so the join exchange moves only maybe-matching rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_scraper_db_spark.io import read_table
from youtube_scraper_db_spark.operators import bloom_join as bj

SF = "/root/testdata/sf0.001"


def _formatted_plan(df):
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_pruned_join_equals_plain_join(spark):
    li = read_table(spark, SF, "lineitem")
    orders = read_table(spark, SF, "orders")
    dim = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    pruned = bj.bloom_pruned_join(li, "l_orderkey", dim, "o_orderkey")
    plain = li.join(dim, li["l_orderkey"] == dim["o_orderkey"])
    assert pruned.exceptAll(plain).count() == 0
    assert plain.exceptAll(pruned).count() == 0


def test_prune_is_superset_of_matches_and_bounded(spark):
    li = read_table(spark, SF, "lineitem")
    orders = read_table(spark, SF, "orders")
    dim = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    mask = bj.bloom_pos_mask(dim, "o_orderkey")
    pruned = bj.bloom_prune(li, "l_orderkey", mask)
    n_pruned = pruned.count()
    n_match = li.join(dim, li["l_orderkey"] == dim["o_orderkey"]).count()
    n_fact = li.count()
    # no false negatives: every matching row passes
    assert n_pruned >= n_match
    # the prune actually prunes (non-matching majority mostly dropped);
    # with n_dim·k/m ≈ 0.45 the fp rate is well under 20% of non-matchers
    assert n_pruned - n_match <= 0.2 * (n_fact - n_match)


def test_empty_dim_prunes_everything(spark):
    li = read_table(spark, SF, "lineitem")
    orders = read_table(spark, SF, "orders")
    empty = orders.where(F.lit(False)).select("o_orderkey")
    mask = bj.bloom_pos_mask(empty, "o_orderkey")
    assert bj.bloom_prune(li, "l_orderkey", mask).count() == 0
    assert (
        bj.bloom_pruned_join(li, "l_orderkey", empty, "o_orderkey").count()
        == 0
    )


def test_null_fact_keys_pruned(spark):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k long, v string"
    )
    dim = spark.createDataFrame([(1,)], "k2 long")
    mask = bj.bloom_pos_mask(dim, "k2")
    got = sorted(
        r["v"] for r in bj.bloom_prune(df, "k", mask).collect()
    )
    assert got == ["a"]  # NULL never equi-joins; 2 is a true negative
    # unless 2 is a false positive — allow it but never the NULL
    assert "b" not in got


def test_membership_filter_evaluates_before_equi_join(spark):
    li = read_table(spark, SF, "lineitem")
    orders = read_table(spark, SF, "orders")
    dim = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    plan = _formatted_plan(
        bj.bloom_pruned_join(li, "l_orderkey", dim, "o_orderkey")
    )
    # the 1-row mask crosses in via the allowlisted scalar BNLJ, and the
    # membership lookups (element_at against the mask map) evaluate
    # there — upstream of the equi-join
    assert "BroadcastNestedLoopJoin" in plan
    assert "element_at" in plan
    bnlj = plan.index("BroadcastNestedLoopJoin")
    equi = max(plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin"))
    assert equi >= 0
    # tree prints top-down: the equi-join (final) prints before its
    # children, so the BNLJ appearing AFTER it in text means it is a
    # descendant — i.e. the prune happens below/before the equi-join
    assert bnlj > equi


def test_anti_join_equals_plain_anti_join(spark):
    li = read_table(spark, SF, "lineitem")
    orders = read_table(spark, SF, "orders")
    dim = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    got = bj.bloom_pruned_anti_join(li, "l_orderkey", dim, "o_orderkey")
    plain = li.join(dim, li["l_orderkey"] == dim["o_orderkey"], "left_anti")
    assert got.exceptAll(plain).count() == 0
    assert plain.exceptAll(got).count() == 0


def test_anti_join_keeps_null_keys_and_duplicates(spark):
    fact = spark.createDataFrame(
        [(1, "m"), (1, "m"), (None, "n"), (None, "n"), (2, "x"), (2, "x")],
        "k long, v string",
    )
    dim = spark.createDataFrame([(1,)], "k2 long")
    got = sorted(
        (
            (r["k"], r["v"])
            for r in bj.bloom_pruned_anti_join(fact, "k", dim, "k2").collect()
        ),
        key=lambda t: (t[0] is not None, t[0] or 0, t[1]),
    )
    # LEFT ANTI: NULL keys never match (kept, twice); 1 matches
    # (dropped, both copies); 2 doesn't match (kept, twice)
    assert got == [(None, "n"), (None, "n"), (2, "x"), (2, "x")]


def test_anti_join_empty_dim_returns_all(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dim = spark.createDataFrame([], "k2 long")
    assert bj.bloom_pruned_anti_join(fact, "k", dim, "k2").count() == 2


def test_saturated_mask_stays_exact(spark):
    # m_bits=64 with hundreds of keys saturates every word: the prune
    # passes everything (no pruning power) but the join result is still
    # row-identical to the plain join — the "saturated stays EXACT"
    # contract from the module docstring
    fact = spark.createDataFrame(
        [(i % 50, f"r{i}") for i in range(300)], "k long, v string"
    )
    dim = spark.createDataFrame([(i,) for i in range(0, 50, 2)], "k2 long")
    got = bj.bloom_pruned_join(fact, "k", dim, "k2", k=3, m_bits=64)
    plain = fact.join(dim, fact["k"] == dim["k2"])
    assert got.exceptAll(plain).count() == 0
    assert plain.exceptAll(got).count() == 0
    anti = bj.bloom_pruned_anti_join(fact, "k", dim, "k2", k=3, m_bits=64)
    plain_anti = fact.join(dim, fact["k"] == dim["k2"], "left_anti")
    assert anti.exceptAll(plain_anti).count() == 0
    assert plain_anti.exceptAll(anti).count() == 0


def test_nondefault_k_and_m_bits_exact(spark):
    fact = spark.createDataFrame(
        [(i, f"r{i}") for i in range(500)], "k long, v string"
    )
    dim = spark.createDataFrame([(i * 7,) for i in range(30)], "k2 long")
    for kk, m in ((1, 1 << 10), (7, 1 << 16)):
        got = bj.bloom_pruned_join(fact, "k", dim, "k2", k=kk, m_bits=m)
        plain = fact.join(dim, fact["k"] == dim["k2"])
        assert got.exceptAll(plain).count() == 0
        assert plain.exceptAll(got).count() == 0


def test_m_bits_must_be_multiple_of_64(spark):
    # m_bits=100 would let positions >= 64 index past the packed word
    # array: try_element_at NULL → coalesce 0 → true members test
    # NEGATIVE. The guard turns that silent contract break into an
    # immediate ValueError at every entry point.
    import pytest

    fact = spark.createDataFrame([(1, "a")], "k long, v string")
    dim = spark.createDataFrame([(1,)], "k2 long")
    for bad in (100, 0, -64, 63):
        with pytest.raises(ValueError, match="multiple of 64"):
            bj.bloom_pos_mask(dim, "k2", m_bits=bad)
        with pytest.raises(ValueError, match="multiple of 64"):
            bj.bloom_prune(fact, "k", None, m_bits=bad)
        with pytest.raises(ValueError, match="multiple of 64"):
            bj.might_contain(F.col("k"), F.col("mask"), m_bits=bad)


def test_might_contain_resolves_string_mask_name(spark):
    # A string mask argument must resolve THAT column, not a hardcoded
    # "mask" — probe through a renamed mask column and check members
    # test positive and a definite non-member's key set stays exact.
    dim = spark.createDataFrame([(i,) for i in range(20)], "k2 long")
    mask = bj.bloom_pos_mask(dim, "k2", k=3, m_bits=1 << 12).select(
        F.col("mask").alias("renamed_words")
    )
    fact = spark.createDataFrame(
        [(i,) for i in range(40)] + [(None,)], "k long"
    )
    got = (
        fact.crossJoin(F.broadcast(mask))
        .where(bj.might_contain(F.col("k"), "renamed_words", k=3, m_bits=1 << 12))
        .select("k")
    )
    kept = {r.k for r in got.collect()}
    assert set(range(20)) <= kept  # no false negatives
    assert None not in kept  # NULL keys test False
