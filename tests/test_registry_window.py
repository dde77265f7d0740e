"""Guard the driver's oracle window (VERDICT r02 items 2, 3, 7).

The driver oracles the FIRST ``ORACLE_WINDOW`` entries of ``queries()``
in dict-insertion order. Rounds 1–2 silently re-checked the same 50
queries while the other 50 never produced a correctness row. These tests
make the window's composition an explicit, asserted artifact so a future
registry edit can't silently push a query out of coverage again.

Round-3 rotation: the never-checked back half (REGISTRY[50:]) registers
first. When rotating next round, update ``EXPECTED_FIRST`` here — the
test is meant to force that edit to be conscious.
"""

from __future__ import annotations

from youtube_scraper_db_spark import registry

#: queries that MUST be inside the checked window this round: the 5
#: approximate-path recall gates (each certifies a no_oracle query) plus
#: the mutation sinks / §2 ids flagged unchecked since round 1.
MUST_BE_WINDOWED = {
    "simhash_recall",
    "lsh_near_dup_recall",
    "lsh_ann_recall",
    "ivf_ann_topk",
    "ivf_kmeans_recall",
    "merge_upsert_orders",
    "insert_if_absent_orders",
    "keyed_delete_orders",
    "field_update_orders",
    "schema_evolution_union",
    "checkpoint_skip_orders",
    "valid_available_parts",
    "timestamped_docs",
    "segment_join_render",
    "mock_fetch_enrichment",
}


def test_window_is_the_never_checked_back_half():
    names = list(registry.queries())
    expected_first = [s.name for s in registry.REGISTRY[registry.ORACLE_WINDOW :]]
    assert names[: len(expected_first)] == expected_first


def test_required_queries_inside_window():
    window = set(list(registry.queries())[: registry.ORACLE_WINDOW])
    missing = MUST_BE_WINDOWED - window
    assert not missing, f"queries pushed out of the driver's checked window: {missing}"


def test_every_windowed_query_has_an_oracle():
    window = list(registry.queries())[: registry.ORACLE_WINDOW]
    oracles = registry.oracle_sql()
    missing = [n for n in window if n not in oracles]
    assert not missing, f"windowed queries with no oracle SQL (weaker check): {missing}"


def test_registry_has_no_duplicate_names():
    names = [s.name for s in registry.REGISTRY]
    assert len(names) == len(set(names))


def test_queries_and_oracles_cover_registry():
    q = registry.queries()
    assert len(q) == len(registry.REGISTRY)
    # every oracle key must correspond to a registered query
    assert set(registry.oracle_sql()) <= set(q)
