"""Property-based checks of the mutation layer against a dict model.

Hypothesis drives random (old, new) tables through merge_upsert /
insert_if_absent / keyed_delete / field_update and compares with the
obvious Python-dict semantics of INSERT OR REPLACE / INSERT OR IGNORE /
DELETE / UPDATE. One shrunken counterexample here is worth dozens of
hand-picked cases — this is the layer SURVEY §7.3 says to test hardest.

Spark round-trips are slow, so examples are capped (max_examples=12,
deadline off) while keys/values stay adversarial: colliding keys, NULLs,
empty tables, duplicate keys inside the new batch.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from youtube_scraper_db_spark.operators import merge

KEYS = st.sampled_from(["k1", "k2", "k3", "k4"])
VALS = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
ROW = st.tuples(KEYS, VALS)
TABLE = st.lists(ROW, max_size=6)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk(spark, rows, unique_keys=False):
    if unique_keys:
        rows = list({k: (k, v) for k, v in rows}.values())
    return spark.createDataFrame(rows, SCHEMA), dict(rows)


@pytest.mark.slow
@given(old=TABLE, new=TABLE)
@SETTINGS
def test_merge_upsert_matches_dict_model(spark, old, new):
    # model: old keys unique (it's a keyed table); new-side dups collapse
    # to ONE arbitrary row, so compare keys exactly and values only where
    # the new batch is unambiguous.
    odf, omap = _mk(spark, old, unique_keys=True)
    ndf, nmap = _mk(spark, new)
    got = {r.k: r.v for r in merge.merge_upsert(odf, ndf, ["k"]).collect()}
    expected_keys = set(omap) | set(nmap)
    assert set(got) == expected_keys
    new_counts = {}
    for k, _ in new:
        new_counts[k] = new_counts.get(k, 0) + 1
    for k in expected_keys:
        if k in nmap:
            if new_counts[k] == 1:
                assert got[k] == nmap[k]
        else:
            assert got[k] == omap[k]


@pytest.mark.slow
@given(old=TABLE, new=TABLE)
@SETTINGS
def test_insert_if_absent_matches_dict_model(spark, old, new):
    odf, omap = _mk(spark, old, unique_keys=True)
    ndf, nmap = _mk(spark, new)
    got = {r.k: r.v for r in merge.insert_if_absent(odf, ndf, ["k"]).collect()}
    assert set(got) == set(omap) | set(nmap)
    for k, v in omap.items():
        assert got[k] == v  # existing rows never change


@pytest.mark.slow
@given(old=TABLE, tomb=TABLE)
@SETTINGS
def test_keyed_delete_matches_dict_model(spark, old, tomb):
    odf, omap = _mk(spark, old, unique_keys=True)
    tdf, tmap = _mk(spark, tomb)
    got = {r.k: r.v for r in merge.keyed_delete(odf, tdf, ["k"]).collect()}
    assert got == {k: v for k, v in omap.items() if k not in tmap}


@pytest.mark.slow
@given(old=TABLE, upd=TABLE)
@SETTINGS
def test_field_update_matches_dict_model(spark, old, upd):
    odf, omap = _mk(spark, old, unique_keys=True)
    udf, umap = _mk(spark, upd, unique_keys=True)
    got = {r.k: r.v for r in merge.field_update(odf, udf, ["k"], ["v"]).collect()}
    assert set(got) == set(omap)  # UPDATE never inserts or deletes
    for k in omap:
        assert got[k] == (umap[k] if k in umap else omap[k])
