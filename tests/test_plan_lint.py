"""Repo-wide physical-plan lint: every registry query's plan is checked
for the scale anti-patterns — an unplanned cartesian product, a
single-partition exchange carrying row data (global-sort funnel), or a
row-at-a-time Python eval. Individual plan-shape tests live in
test_plan_quality.py; this sweep guarantees no NEW query ships with a
100 TB foot-gun."""

from __future__ import annotations

import pytest

from youtube_scraper_db_spark.registry import REGISTRY

SF = "/root/testdata/sf0.001"

#: queries whose plan legitimately contains an Arrow-batched Python
#: stage (mapInPandas/applyInPandas kernels — the sanctioned escape
#: hatch, never row-at-a-time).
ARROW_STAGES = {
    "seq_packing_gate",          # FFD packing is applyInPandas by design
    "multimodal_frame_samples",  # stub decode kernel is mapInPandas
    "image_header_decode",       # real header-parse kernel is mapInPandas
    "png_pixel_stats",           # real inflate+unfilter pixel kernel is mapInPandas
    "jpeg_pixel_stats",          # real Huffman+IDCT pixel kernel is mapInPandas
    "mjpeg_frame_pixel_stats",   # RIFF walk + per-frame JPEG decode kernel
    "gif_pixel_stats",           # real LZW+de-interlace pixel kernel is mapInPandas
    "bmp_pixel_stats",           # real BMP layout-quirk kernel is mapInPandas
    "gif_frame_pixel_stats",     # per-frame LZW decode fan-out kernel is mapInPandas
    "avi_frame_samples",         # real RIFF container-walk sampler is mapInPandas
    "gif_frame_samples",         # real GIF block-walk kernel is mapInPandas
    "audio_meta_decode",         # real WAV chunk-walk kernel is mapInPandas
    "audio_energy_windows",      # real PCM RMS kernel is mapInPandas
    "pcm_depth_energy_windows",  # same kernel, 8/24/32-bit depth fixtures
    "adpcm_energy_windows",      # same kernel, IMA ADPCM decode fixtures
    "g711_energy_windows",       # same kernel, G.711 companding fixtures
    "msadpcm_energy_windows",    # same kernel, MS-ADPCM decode fixtures
    "bpe_apply_tokens",          # vocabulary-memoized BPE encode kernel
    "unigram_apply_tokens",      # vocabulary-memoized Viterbi encode kernel
    "wordpiece_apply_tokens",    # vocabulary-memoized greedy-match kernel
    "doc_unigram_quality",       # word-memoized Viterbi LM scoring kernel
    "image_resize_stats",        # decode + integer-exact resize kernel
    "mock_fetch_enrichment",     # injected fetcher runs as a pandas stage
    "simhash_dups",              # numpy bit-matrix signature kernel
    "simhash_recall",
    "pq_ann_recall",             # PQ encode/ADC kernel is mapInPandas
    "heavy_hitter_words",        # Misra-Gries summary is mapInPandas
    "token_runs_udtf",           # Arrow-optimized lateral UDTF (the §2.10 surface demo)
    "bpe_artifact_roundtrip",      # two memoized apply kernels (trained vs loaded model)
    "unigram_artifact_roundtrip",  # two memoized Viterbi apply kernels
    "wordpiece_artifact_roundtrip",  # two memoized greedy-match apply kernels
    "incremental_pq_equiv",      # PQ encode/ADC kernels over base+batch+full
    "stream_heavy_hitter_words",  # recount joins the drained MG candidates
    # round 9
    "pq_artifact_roundtrip",     # PQ encode/ADC kernels (stored + reloaded books)
    "heavy_hitter_merge",        # per-partition MG summaries are mapInPandas
    "heavy_hitter_artifact_fold",  # same MG summary kernels, saved + batch
    "heavy_hitter_words_by_lang",  # per-group MG summary kernel
    # round 10: decode+resize+dhash kernel is mapInPandas
    "image_dhash_near_dups",
    # round 10: daily leaf sketches come from the grouped bottom-k
    # kernel (operators/kmv.py)
    "kmv_sliding_distinct_users",
    # round 10: per-partition bottom-k-of-distinct-hashes kernels
    # (operators/kmv.py) — O(k) state, map-only
    "kmv_distinct_users",
    "kmv_distinct_users_by_type",
    "kmv_union_merge",
    "kmv_semijoin_cardinality",
    "kmv_artifact_fold_roundtrip",
    # round 11: the 30-day calendar reuses the grouped bottom-k kernel
    "kmv_sliding_distinct_users_30d",
    # round 11: per-day MG leaf summaries are the grouped MG kernel
    "heavy_hitter_types_sliding",
    # round 13: the 3-way ends witness derives KMV ends from the KMV
    # family's OWN leaf table — the grouped bottom-k kernel again (the
    # Bloom/HLL leaf builders themselves are pure Column expressions)
    "bloom_sliding_membership",
    # round 13 (opt): the direct-KMV witness's bottom-k kernel is now
    # VISIBLE in the final plan — the single-use localCheckpoint that
    # used to hide it behind an ExistingRDD was removed as a measured
    # perf win; the kernel itself is the kmv_distinct_users shape
    "stream_kmv_distinct_users",
}

#: queries where a BroadcastNestedLoopJoin is the documented, bounded
#: pattern: either the build side is a 1-row scalar aggregate (gate
#: queries joining a count), or a ≤16-row broadcast query-vector side
#: (ANN), or the O(n²) exact baseline that exists as the recall oracle
#: for a shipped subquadratic twin.
BNLJ_OK = {
    "summary_stats",        # agg-of-agg scalar comparison
    "stale_events",         # threshold vs global-max scalar
    "embedding_cosine_topk",  # broadcast query vectors (≤16 rows)
    "embedding_knn_join",
    "embedding_near_dups",  # exact twin for the LSH recall gates
    "minhash_lsh_recall",   # scalar found/expected joins
    "simhash_recall",
    "lsh_near_dup_recall",
    "lsh_ann_recall",
    "ivf_ann_topk",         # nprobe centroid-distance scalar
    "ivf_kmeans_recall",
    "seq_packing_gate",     # invariant gate joins three scalar aggs
    "int8_ann_topk",        # broadcast 1-row quantized query vector
    "int8_ann_recall",
    "pq_ann_recall",        # scalar gate joins + broadcast query re-rank
    "lang_mixing_weights",  # |langs| rows × 1-row weight-total scalar
    "vocab_coverage_curve",  # 3 cut rows × 1-row token-total scalar
    "heavy_hitter_words",   # ≤k-1 candidate rows × 1-row total scalar
    "classic_q22_idle_balance",  # 1-row scalar avg-balance broadcast (Q22's uncorrelated subquery)
    "classic_q11_important_stock",  # 1-row grand-total broadcast (Q11's fraction threshold)
    "hll_distinct_users",   # 1-row sketch estimate × 1-row exact-distinct scalar
    "stream_hll_distinct_users",  # same shape over the drained registers
    "hll_union_merge",      # three 1-row scalar joins (merged/direct/exact)
    "cms_union_merge",      # 1-row cell-diff/estimate/exact scalar joins
    "bloom_union_merge",    # 1-row report × bit-count × equality scalars
    "doc_bigram_quality",   # 1-row smoothed-total scalar broadcast
    "doc_trigram_quality",  # same 1-row smoothed-total broadcast, one more order
    "histogram_quantile_sketch",  # 1-row stats/pick/exact/merge scalars
    "stream_histogram_quantiles",  # same scalars over the drained bins
    "incremental_ivf_equiv",  # nprobe centroid scalar + 1-row equiv/recall scalars
    "incremental_pq_equiv",   # 1-row code/topk/recall scalar joins
    "bpe_artifact_roundtrip",      # 1-row checksum/count/mismatch scalar joins
    "unigram_artifact_roundtrip",  # 1-row checksum/count/mismatch scalar joins
    "wordpiece_artifact_roundtrip",  # 1-row checksum/count/mismatch scalar joins
    "bigram_model_artifact_roundtrip",  # 1-row checksum/mismatch scalars
    "incremental_bigram_model_equiv",   # 1-row checksum/merge/mismatch scalars
    "stream_heavy_hitter_words",  # 1-row total scalar vs candidate counts
    "histogram_range_shards",     # 1-row stats/cap scalar broadcasts
    "tfidf_cosine_pairs",         # 1-row doc-count scalar vs the df table
    # round 9: the artifact/fold gates join 1-row checksum / sym-diff /
    # recall scalars (and the ANN ones carry the nprobe centroid scalar)
    "ivf_artifact_roundtrip",
    "pq_artifact_roundtrip",
    "heavy_hitter_merge",         # ≤k-1 candidates × 1-row total (the
                                  # heavy_hitter_words shape) + kth-trim scalar
    "incremental_cc_equiv",       # labels × 1-row fold-consistency scalar
    "trigram_model_artifact_roundtrip",
    "incremental_trigram_model_equiv",
    "hll_artifact_fold_roundtrip",
    "cms_artifact_fold_roundtrip",
    "bloom_artifact_fold_roundtrip",
    "histogram_artifact_frozen_fold",  # 1-row frozen-edges broadcast + scalars
    "heavy_hitter_artifact_fold",      # candidates × 1-row total + trim scalars
    # round 10: the grouped Bloom probe matrix is a broadcast cross join
    # of the ≤ dim-cardinality group list against the distinct probe
    # keys — the partition-pruning question asked group-wise, never a
    # data×data cartesian
    "bloom_filter_by_type",
    # round 10: 1-row saved-count / sym-diff scalar joins (the artifact
    # gate shape)
    "minhash_index_artifact_roundtrip",
    "incremental_minhash_equiv",
    "stream_cc_labels",           # drained labels × 1-row sym-diff scalar
    "weighted_sample_merge",      # 64 merged rows × 1-row sym-diff scalar
    "stream_lsh_ingest_dups",     # drained pairs × 1-row sym-diff scalar
    # round 10: KMV gates join 1-row estimate / theta / exact-distinct
    # scalars against ≤k-row sketch tables
    "kmv_distinct_users",
    "kmv_union_merge",
    "kmv_semijoin_cardinality",
    "kmv_artifact_fold_roundtrip",
    # round 10: dim-types × generated-calendar spine cross join
    "event_value_locf",
    # round 10: |types| count rows × 1-row total scalar
    "event_type_entropy",
    # round 10: frontier-superset survivors × survivors exact dominance
    # recheck (both sides bucket-pruned to frontier scale) + the 1-row
    # min/max normalization scalars
    "pareto_frontier_parts",
    # round 10: 1-row estimate / sym-diff / exact scalar joins over
    # k-row (checkpointed) sketch tables; benford joins the 1-row total
    "stream_kmv_distinct_users",
    "kmv_rollup_merge",
    "benford_price_digits",
    # round 10: three 1-row scalar aggregates (triangles/edges/degree
    # stats) cross-joined into the single report row
    "near_dup_triangles",
    # round 10: 1-row theta / sym-diff / checksum / corpus-total scalar
    # joins (sketch + artifact gate shape; bm25 broadcasts the 1-row
    # N/Σdl corpus stats)
    "kmv_antijoin_cardinality",
    "trigram_index_artifact_roundtrip",
    "bm25_search_scores",
    # round 10: two bounded range joins — |days| dim × broadcast
    # days×k sketch rows (the sliding merge), and the exact witness's
    # days × events range join, the baseline the leaf-sketch store
    # replaces (the embedding_near_dups exact-twin precedent)
    "kmv_sliding_distinct_users",
    # round 10: frontier-sized drained rows × 1-row sym-diff scalar;
    # BM25 fold joins 1-row stats / checksum / witness scalars
    "stream_skyline_parts",
    "bm25_index_artifact_fold",
    # round 11: sliding calendars — |days| dim × broadcast leaf tables
    # (days×k sketch rows / days×2^p register rows / days×(k-1) MG
    # summary rows / days×|keys| deduped exact-witness rows) range
    # joins; all sides dim-bounded, never raw events
    "kmv_sliding_distinct_users_30d",
    "hll_sliding_distinct_users",
    "heavy_hitter_types_sliding",
    # round 11: the 1-row broadcast Bloom mask crossJoin (the scalar
    # BNLJ this list exists for) + 1-row pass/total/sym-diff scalars
    "bloom_pruned_join",
    "bloom_pruned_anti_join",
    # round 11: k-row drained reservoir × 1-row sym-diff scalar
    "stream_weighted_sample",
    # round 11: same frontier-superset recheck as the global gate,
    # with the group-equality conjunct in the join condition
    "pareto_frontier_by_brand",
    # round 11: sliding quantiles — |days| dim × broadcast days×64 leaf
    # bins range join + per-q 1-row pick joins; mask merge — 1-row ×
    # 1-row zip_with crosses + the 1-row mask probe/scalar joins
    "event_value_quantiles_sliding",
    "bloom_mask_union_merge",
    # round 12: beam-search scoring crossJoins the 1-row broadcast
    # query vector per hop (the cosine_topk shape); the gate row joins
    # 1-row recall / edge-count scalars
    "graph_ann_topk",
    # round 12: nprobe centroid-distance scalar + 1-row sym-diff scalar
    # over the drained index search (the ivf_ann_topk shape)
    "stream_ivf_ingest",
    # round 12: both families' dim-bounded leaf range joins (the
    # kmv/hll sliding shapes) + the 1-row ends sym-diff scalar
    "sliding_spine_consistency",
    # round 12: the graph_ann_topk shape plus 1-row equiv / checksum
    # scalar joins (fold-equivalence and artifact gates)
    "incremental_nsw_equiv",
    "nsw_index_artifact_roundtrip",
    # round 12: the same shape over the drained cell store + the 1-row
    # sym-diff scalar
    "stream_nsw_ingest",
    # round 13: the delete gates inherit their families' shapes — the
    # post-delete search crossJoins the 1-row query vector / nprobe
    # scalar, plus the 1-row delete-consistency sym-diff scalar
    "stream_ivf_delete_equiv",
    "stream_nsw_delete_equiv",
    "stream_lsh_delete_equiv",
    # round 13: the sliding-Bloom probe grid is the broadcast dim × dim
    # cross join (the bloom_filter_by_type shape) + the 1-row 3-way
    # ends sym-diff scalar
    "bloom_sliding_membership",
    # round 13: the stream_ivf_delete_equiv shape over the compacted
    # store (nprobe scalar + 1-row consistency scalar)
    "store_compaction_equiv",
}

#: queries where an `Exchange SinglePartition` carrying rows is the
#: documented, BOUNDED pattern: the window's input is an aggregated
#: dimension (cardinality of a dim key, not fact rows) — the same
#: boundedness class as the scalar-total cross joins in BNLJ_OK. Keep
#: this list short and justified; fact-row funnels stay forbidden.
SINGLE_PARTITION_OK = {
    "top_suppliers_with_ties",  # global rank over |suppliers| aggregated counts
    "supplier_revenue_deciles",  # ntile/cume_dist over |suppliers| aggregated partials
    "histogram_quantile_sketch",  # cumulative sum over 64 aggregated bins
    "stream_histogram_quantiles",  # same 64-bin cumulative sum (drained counters)
    "histogram_range_shards",  # 64-bin cumsum + lag over <=8 shard rows
    # round 10: running max over the 64-bucket skyline threshold table
    "pareto_frontier_parts",
    # round 13 (opt): the direct pareto_frontier witness's 64-bucket
    # threshold window is now VISIBLE in the final plan (its single-use
    # localCheckpoint was removed as a measured perf win) — the same
    # bounded shape already allowlisted for pareto_frontier_parts
    "stream_skyline_parts",
}


def _single_partition_carries_data(plan: str) -> bool:
    """True iff some `Exchange SinglePartition` feeds from anything other
    than a partial scalar aggregate (merging one row per task is the
    correct two-phase global agg; funnelling row data is the bug)."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        below = "\n".join(lines[i + 1 : i + 3])
        if "Aggregate(keys=[]" not in below and "partial_" not in below:
            return True
    return False


@pytest.mark.parametrize("s", REGISTRY, ids=lambda s: s.name)
def test_no_scale_antipatterns(spark, s):
    df = s.fn(spark, SF)
    # Driver-output contract (VERDICT r04): the driver's canonicalizer
    # sorts result columns with pandas and cannot hash list/dict cells —
    # the ONLY two r04-red rows were the two queries emitting array
    # columns. Nested output types are therefore forbidden registry-wide;
    # render arrays to deterministic strings (the ordered_part_lists /
    # label_centroids pattern) before returning.
    from pyspark.sql.types import ArrayType, MapType, StructType

    nested = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, (
        f"{s.name} emits nested output columns {nested} — the driver's "
        "canonicalizer cannot hash them; stringify (see label_centroids)"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{s.name} plans a cartesian product"
    if s.name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{s.name} plans a nested-loop join"
        )
    assert "BatchEvalPython" not in plan, (
        f"{s.name} uses a row-at-a-time Python UDF"
    )
    if s.name not in ARROW_STAGES:
        assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, (
            f"{s.name} has an unexpected Python stage"
        )
    if s.name not in SINGLE_PARTITION_OK:
        assert not _single_partition_carries_data(plan), (
            f"{s.name} funnels row data through a single partition"
        )


def test_no_oracle_uses_re2_backslash_s():
    """RE2's \\s lacks U+000B while Java's and Python-ASCII's include it
    (ADVICE r06): every oracle must spell the whitespace class out as
    [ \\t\\n\\x0B\\f\\r] — any \\s in a rendered oracle string silently
    diverges from the engine on \\v-bearing text."""
    offenders = [
        s.name
        for s in REGISTRY
        if s.oracle is not None and "\\s" in s.oracle
    ]
    assert not offenders, (
        f"oracles using RE2 \\s instead of the explicit class: {offenders}"
    )


def test_ws_class_is_java_backslash_s():
    """The shared constant must stay exactly Java's \\s set — the engine
    side's behavior contract."""
    import re

    from youtube_scraper_db_spark.llm.text import WS_CLASS

    java_s = {" ", "\t", "\n", "\x0b", "\f", "\r"}
    matched = {c for c in map(chr, range(256)) if re.fullmatch(WS_CLASS, c)}
    assert matched == java_s
