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
]

#: text-family gates whose oracles must survive edge whitespace (the
#: fixed class); media/fixture gates read doc_id only and are exempt.
GATES = [
    "doc_fingerprints",
    "ngram_jaccard_pairs",
    "minhash_lsh_dups",
    "minhash_lsh_recall",
    "simhash_dups",
    "decontamination_flags",
    "bpe_trained_merges",
    "bpe_apply_tokens",
    "unigram_trained_vocab",
    "unigram_apply_tokens",
    "doc_unigram_quality",
    "html_text_extract",
    "doc_token_ids",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")
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
