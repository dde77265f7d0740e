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


def test_rotation_matches_round_offset():
    """queries() must be REGISTRY rotated by window_offset() — the
    deterministic per-round walk that guarantees every query re-enters
    the driver's checked window every ceil(len/50) rounds."""
    names = list(registry.queries())
    off = registry.window_offset()
    expected = [
        s.name
        for s in registry.REGISTRY[off:] + registry.REGISTRY[:off]
    ]
    assert names == expected


def test_offset_walks_fifty_per_round():
    n_reg = len(registry.REGISTRY)
    assert registry._offset_for_round(0) == 0  # fresh repo: natural order
    assert registry._offset_for_round(1) == 0  # r01 checked [0:50]
    assert registry._offset_for_round(2) == 50  # round 3 windows [50:100]
    assert registry._offset_for_round(3) == 100  # round 4: the newest batch
    assert registry._offset_for_round(4) == 150 % n_reg  # wraps
    # with the current registry size, four rounds cover every query
    covered = set()
    for n in (1, 2, 3, 4):
        off = registry._offset_for_round(n)
        covered |= {(off + i) % n_reg for i in range(registry.ORACLE_WINDOW)}
    assert covered == set(range(n_reg))


def test_required_queries_inside_window():
    """Round 3 (offset 50) must window the ids never checked in r01/r02;
    later rounds rotate past them by design, so the assertion is gated
    on the offset this round actually runs with."""
    if registry.window_offset() != 50:
        return
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
