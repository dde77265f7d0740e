"""Contract test for the driver-generated testdata (TESTDATA.md).

The driver has regenerated /root/testdata between rounds with different
parquet timestamp encodings (TIMESTAMP(NANOS), then no-tz timestamp[us] →
Spark TIMESTAMP_NTZ). io.read_table normalizes those at the IO boundary;
this test pins the ENGINE-VISIBLE schema so the next silent regeneration
fails here, in pytest, instead of only in the per-round bench.

Unit-test fixtures (conftest.py) are built via createDataFrame with
tz-aware datetimes and can never see the real parquet encodings — this is
deliberately the one test module that reads /root/testdata directly.
"""

from __future__ import annotations

import os

import pytest

from youtube_scraper_db_spark.io import read_table

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)

#: engine-visible dtypes after io.read_table normalization. Timestamp
#: columns MUST be plain session-TZ "timestamp" — never "timestamp_ntz"
#: (unhandled NTZ broke 3 queries + the bench in round 2) and never
#: "bigint" (the raw nanosAsLong fallback leaking through).
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {"c_custkey": "bigint", "c_name": "string", "c_nationkey": "int"},
    "supplier": {"s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int"},
    "part": {"p_partkey": "bigint", "p_name": "string"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@needs_testdata
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_engine_visible_schema(spark, table):
    got = dict(read_table(spark, SF_DIR, table).dtypes)
    expected = EXPECTED[table]
    # key columns must exist with the pinned engine-visible type; extra
    # additive columns are allowed (schema evolution is a feature, S16).
    missing = {c: t for c, t in expected.items() if got.get(c) != t}
    actual = {c: got.get(c) for c in missing}
    assert not missing, (
        f"{table}: engine-visible dtypes drifted: expected {missing}, "
        f"got {actual} — the driver likely regenerated /root/testdata "
        f"with a new encoding; fix in io.read_table, never per-query. "
        f"Full schema: {got}"
    )


@needs_testdata
def test_no_ntz_leaks_anywhere(spark):
    """No table may expose timestamp_ntz through read_table, ever."""
    for table in EXPECTED:
        for col, dtype in read_table(spark, SF_DIR, table).dtypes:
            assert "ntz" not in dtype, f"{table}.{col} leaked {dtype}"
            assert dtype != "timestamp_ltz", f"{table}.{col} leaked {dtype}"


@needs_testdata
def test_table_layout_inventory():
    """Every table exists as a single parquet FILE or a parquet DIRECTORY.
    Both layouts are supported end-to-end (io.read_table_stream handles
    each explicitly — round-3 ADVICE: the glob-filter route silently
    matched nothing for directory-style tables), so this is an inventory
    canary, not a single-file pin: it fails only if a regeneration
    produces a layout neither branch recognizes."""
    for table in EXPECTED:
        path = os.path.join(SF_DIR, f"{table}.parquet")
        assert os.path.isfile(path) or os.path.isdir(path), (
            f"{table}: unrecognized testdata layout at {path}"
        )
        if os.path.isdir(path):
            assert any(f.endswith(".parquet") for f in os.listdir(path)), (
                f"{table}: directory-style table with no part files"
            )


@needs_testdata
@pytest.mark.parametrize(
    "sf_dir",
    [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1") if os.path.isdir(d)],
)
def test_transcript_roundtrip_content_invariants(spark, sf_dir):
    """The transcript/inbox round-trip oracles (registry
    _write_transcript_inbox + _TRANSCRIPT_RT_ORACLE) assume the first 100
    documents contain: no empty/whitespace-only text (the oracle filters
    trim(text) <> '' while the writer emits every file), no lines the S9
    header grammar would capture (TITLE:/URL:/ID: at line start — the
    parser would slice them out of the body), and no carriage returns
    (the body regex treats \\r\\n specially). Round-3 ADVICE: assert them
    here so a driver regeneration breaks loudly in pytest instead of as
    an opaque hash mismatch in a driver correctness row."""
    from pyspark.sql import functions as F

    docs = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    bad = docs.where(
        F.col("text").isNull()
        | (F.trim("text") == "")
        | F.col("text").rlike(r"(?m)^(TITLE|URL|ID):")
        | F.col("text").contains("\r")
    )
    offenders = [r.doc_id for r in bad.select("doc_id").limit(5).collect()]
    assert not offenders, (
        f"{sf_dir}: documents {offenders} violate the transcript "
        f"round-trip content invariants (empty text, header-like line, "
        f"or carriage return) — update _write_transcript_inbox / the "
        f"oracle before the driver correctness gate hits this"
    )


@needs_testdata
def test_events_ts_values_sane(spark):
    """ts must parse to plausible instants (not 1970-epoch junk from a
    mis-scaled nanos fallback)."""
    from pyspark.sql import functions as F

    row = (
        read_table(spark, SF_DIR, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    assert row.lo.year >= 2000, row
    assert row.hi.year <= 2100, row
