"""Edge-whitespace oracle parity — the corpus the driver testdata can't
provide: SQL/Java trim strip SPACES only, so tab- or newline-edged text
leaves a phantom '' token in a naive split while the engine's
re-trimming tokenizers drop it. The round-6 review caught this as a
latent false-fail in the text-gate oracles; this harness runs the
affected registry queries AND their DuckDB oracles over a tiny
synthetic documents table full of hostile edges (leading tab, trailing
newline, NBSP inside words, whitespace-only, empty, multi-space runs)
and value-compares exactly like tools/check_oracle."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from check_oracle import canon_rows  # noqa: E402

from youtube_scraper_db_spark.registry import REGISTRY

EDGE_TEXTS = [
    (0, "\tthe quick brown fox jumps over the lazy dog"),
    (1, "plain words here with table scan value row\n"),
    (2, "  leading spaces and trailing  \t"),
    (3, "nbsp inside words stays one token plus extras"),
    (4, ""),
    (5, " \t\n "),
    (6, "multi   space    runs collapse fine table scan"),
    (7, "\n\nnewline led text with enough words for shingles\n"),
    (8, "x"),
    (9, "the quick brown fox jumps over the lazy dog"),  # near-dup of 0
    (10, None),  # NULL text — documents.text is nullable
    # U+000B vertical tab: Java/Python-ASCII \s includes it, RE2 \s does
    # NOT — the one char that forced the explicit [ \t\n\x0B\f\r] class
    # everywhere (ADVICE r06). Mid-word, edge, and run positions.
    (11, "vertical\x0btab must split words the same in both engines"),
    (12, "\x0bleading vtab and trailing too with words enough\x0b"),
    (13, "mixed \x0b \t\x0b\n runs collapse to one separator here"),
]

#: text-family gates whose oracles must survive edge whitespace (the
#: fixed class); media/fixture gates read doc_id only and are exempt.
GATES = [
    # dedup / fingerprint family
    "doc_fingerprints", "exact_dedup_docs", "ngram_jaccard_pairs",
    "minhash_lsh_dups", "minhash_lsh_recall", "simhash_dups",
    "simhash_recall", "decontamination_flags", "near_dup_clusters",
    "near_dedup_keep", "incremental_dedup_new", "substring_dup_flags",
    "segment_dedup_docs",
    # tokenizers
    "bpe_pair_counts", "bpe_trained_merges", "bpe_apply_tokens",
    "unigram_trained_vocab", "unigram_apply_tokens", "doc_unigram_quality",
    "wordpiece_trained_merges", "wordpiece_apply_tokens",
    "doc_bigram_quality", "doc_token_ids",
    # text stats / curation
    "doc_token_stats", "doc_lang_id", "doc_repetition_stats",
    "doc_unigram_rarity", "doc_tfidf_terms", "corpus_vocab_topk",
    "vocab_coverage_curve", "heavy_hitter_words", "lang_mixing_weights",
    "corpus_curation_report", "doc_chunks", "doc_pii_scrub",
    # sampling / packing / sharding
    "doc_split_assign", "doc_stratified_sample", "corpus_mix_epochs",
    "weighted_doc_sample", "seq_packing_gate", "training_shard_manifest",
    # scalar-function and extraction surfaces
    "extracted_video_ids", "extracted_page_refs", "doc_search_snippets",
    "timestamped_docs", "segment_join_render", "html_text_extract",
    "multimodal_meta",
    # token_runs_udtf is excluded: its engine side also reads the
    # region table (lateral-join demo), which this documents-only
    # harness does not synthesize
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    rows = [
        (i, t, ["en", "de", "fr"][i % 3], ["web", "book"][i % 2],
         len(t) if t is not None else 0)
        for i, t in EDGE_TEXTS
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", GATES)
def test_edge_whitespace_oracle_parity(name, spark, edge_dir, edge_duck):
    spec = next(s for s in REGISTRY if s.name == name)
    sdf = spec.fn(spark, edge_dir)
    srows = [tuple(r) for r in sdf.collect()]
    rel = edge_duck.sql(spec.oracle)
    orows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns), name
    cs = canon_rows(sdf.columns, srows)
    co = canon_rows(rel.columns, orows)
    assert cs == co, (
        f"{name}: engine={len(srows)} oracle={len(orows)}; "
        f"first engine-only: {[r for r in cs if r not in set(co)][:2]}; "
        f"first oracle-only: {[r for r in co if r not in set(cs)][:2]}"
    )
