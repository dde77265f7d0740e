"""llm/packing.py — FFD invariants: exhaustive assignment, capacity
respected, determinism, and fill efficiency vs the trivial lower bound."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from youtube_scraper_db_spark.llm.packing import pack_sequences

CAP = 100


def _pack(spark, lengths, buckets=4):
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lengths)], "doc_id long, n long"
    )
    return pack_sequences(df, "doc_id", "n", capacity=CAP, num_buckets=buckets)


def test_every_doc_packed_once_and_bins_fit(spark):
    rng = random.Random(3)
    lengths = [rng.randint(1, 130) for _ in range(500)]
    out = _pack(spark, lengths).collect()
    assert sorted(r.doc_id for r in out) == list(range(500))
    loads: dict[str, int] = {}
    for r in out:
        assert r.packed_len == min(lengths[r.doc_id], CAP)
        loads[r.bin_id] = loads.get(r.bin_id, 0) + r.packed_len
    assert max(loads.values()) <= CAP
    # fill efficiency: never worse than 2x the volume lower bound
    lower = sum(min(l, CAP) for l in lengths) / CAP
    assert len(loads) <= 2 * lower


def test_deterministic_across_runs(spark):
    lengths = [((i * 37) % 120) + 1 for i in range(300)]
    a = {r.doc_id: r.bin_id for r in _pack(spark, lengths).collect()}
    b = {r.doc_id: r.bin_id for r in _pack(spark, lengths).collect()}
    assert a == b


def test_oversize_doc_gets_own_full_bin(spark):
    out = {r.doc_id: r for r in _pack(spark, [250, 10, 10], buckets=1).collect()}
    assert out[0].packed_len == CAP
    partners = [r.doc_id for r in out.values() if r.bin_id == out[0].bin_id]
    assert partners == [0]
