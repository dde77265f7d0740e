"""Deduplication for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design (the whole point of these operators):
- exact dedup      : one hash-groupBy on a 16-byte fingerprint — shuffles
                     fingerprints, not documents.
- Jaccard pairs    : inverted-index self-join on shingles (candidates =
                     docs sharing ≥1 shingle), never an O(n²) cross join.
- MinHash+LSH      : per-doc signature (map-only) → band explode →
                     bucket groupBy → pairs within buckets. Shuffle volume
                     is O(docs × bands), independent of document length.
- SimHash          : 64-bit signature via one Arrow-batched pandas UDF
                     (bit-vote loop is genuinely non-relational), then
                     bucket joins on signature prefixes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import content_fingerprint, py_tokens, shingle_rows


class CacheScope:
    """Caller-controlled lifetime for persisted intermediates.

    ``jaccard_pairs`` / ``minhash_lsh_pairs`` persist intermediates that
    feed multiple downstream branches; the returned DataFrame is lazy, so
    they cannot unpersist before returning. A caller running many dedup
    jobs in one long-lived session passes its own scope and calls
    ``release()`` after the terminal action. With no explicit scope, a
    module-default scope releases the PREVIOUS call's pins at each new
    call — the session holds at most one call's cache instead of leaking
    cached partitions without bound."""

    def __init__(self) -> None:
        self._pinned: list[DataFrame] = []

    def persist(self, df: DataFrame) -> DataFrame:
        self._pinned.append(df)
        return df.persist()

    def release(self) -> None:
        for df in self._pinned:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — pin bound to a stopped
                pass  # SparkContext: the cache died with the session.
        self._pinned.clear()


_DEFAULT_SCOPE = CacheScope()


def _scope_or_default(scope: CacheScope | None) -> CacheScope:
    if scope is None:
        _DEFAULT_SCOPE.release()
        return _DEFAULT_SCOPE
    return scope


def _spread(df: DataFrame) -> DataFrame:
    """Fan a small-but-compute-heavy input out to full parallelism.

    Text pipelines routinely read a few MB of documents (one parquet
    split → ONE task) and then spend seconds per document on
    tokenize/shingle expressions — the scan parallelism, not the compute,
    becomes the bottleneck. A round-robin repartition to the cluster's
    default parallelism costs one shuffle of the raw text and buys
    N-core execution of everything downstream. At 100 TB the scan already
    yields thousands of splits and this is a no-op-sized shuffle relative
    to the compute it unlocks."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


# --- exact ------------------------------------------------------------

def exact_dedup_flags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Tag every row with its content fingerprint, duplicate-group size and
    an ``is_canonical`` flag (lowest id in the group wins). Keeps all rows
    so downstream can either filter or audit."""
    fp = content_fingerprint(text_col).alias("content_fp")
    with_fp = df.select(F.col(id_col), fp)
    w = Window.partitionBy("content_fp")
    wo = w.orderBy(F.col(id_col))
    return (
        with_fp.withColumn("dup_count", F.count("*").over(w).cast("long"))
        .withColumn(
            "is_canonical", (F.row_number().over(wo) == 1).cast("int")
        )
    )


def substring_dup_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    gram: int = 64,
    keep_mod: int = 4,
) -> DataFrame:
    """Exact-substring duplication detector (the Lee et al. 2022
    "Deduplicating Training Data" mode that MinHash misses: long literal
    copies embedded in otherwise-distinct documents). Flags every
    document that shares at least one exact ``gram``-char substring with
    ANOTHER document, returning ``(doc, n_shared_grams)``.

    Candidate grams are CONTENT-DEFINED sampled — keep a gram iff
    ``int(md5(gram)[:8], 16) % keep_mod == 0`` — so selection depends
    only on the bytes themselves, never the offset: two documents
    sharing a long substring at different alignments still sample the
    SAME grams (a fixed-stride sample would miss misaligned copies
    entirely). Expected 1/keep_mod of the L-gram+1 positions survive;
    a shared span of length ``gram + k`` has k+1 chances to be sampled.

    Shape at 100 TB: gram explode is map-side; one shuffle on the gram
    key for the frequency count-window (the aggregate+join fusion used
    for shingle doc-frequency), one key-local aggregate per doc. In
    production the shuffle key would be an 8-byte digest of the gram
    rather than the 64-char string (4-8× narrower exchange); the string
    key is kept here so the DuckDB oracle is textually identical.
    md5 is the portable sampling hash (same literal result in both
    engines); a cluster deployment would swap in xxhash64."""
    t = F.col(text_col)
    positions = F.sequence(F.lit(1), F.length(t) - (gram - 1))
    sampled = F.filter(
        F.array_distinct(
            F.transform(positions, lambda i: F.substring(t, i, gram))
        ),
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % keep_mod
        == 0,
    )
    rows = df.where(F.length(t) >= gram).select(
        F.col(id_col).alias("doc"), F.explode(sampled).alias("gram")
    )
    nd = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    return (
        rows.withColumn("nd", nd)
        .where(F.col("nd") >= 2)
        .groupBy("doc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )


# --- n-gram Jaccard ---------------------------------------------------

def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 1,
    threshold: float = 0.5,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over distinct word ``k``-gram sets for every
    pair with J ≥ ``threshold`` — AllPairs/PPJoin-style prefix filtering.

    A naive inverted-index self-join explodes on frequent shingles (every
    pair of docs sharing a common phrase becomes a candidate). Instead:

    1. order every doc's shingles rarest-first (global doc-frequency, tie
       broken by shingle — one common total order);
    2. index only each doc's PREFIX: the first ``n - ceil(t*n) + 1``
       shingles. Theorem (AllPairs): J(A,B) ≥ t implies the prefixes
       share at least one element, so candidate generation on prefixes
       alone is lossless;
    3. prune candidates whose sizes are incompatible
       (``min < t * max`` contradicts J ≥ t);
    4. verify exactly via array_intersect on the full sets.

    Frequent shingles land at the END of each ordered set and mostly fall
    outside every prefix — the candidate blowup disappears while the
    result stays exact. Shuffles: df-count, ordered-set build, candidate
    join, verify join — all on keys, never on the O(n²) pair space.
    """
    # One shingle evaluation per document, total: explode drops empty
    # arrays by itself (no size filter re-evaluating the expression), and
    # the exploded inverted index persists for its two consumers (df-count
    # and ordered-set build). Cache lifetime is scope-managed (CacheScope).
    scope = _scope_or_default(scope)
    ex = scope.persist(
        shingle_rows(
            _spread(df.select(F.col(id_col).alias("doc"), F.col(text_col))),
            "doc",
            text_col,
            k,
        )
    )
    # Doc-frequency via a count window over the shingle partition: one
    # shuffle hash-partitions the index by shingle and every row picks up
    # its df in place — versus the separate groupBy-aggregate + join it
    # replaces, which shuffled the same rows by the same key TWICE (once
    # into the aggregate, once as the join probe).
    dfw = F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    # Materialized once: consumed by the prefix index and BOTH verify
    # sides — without persist the tokenize→shingle→order pipeline (the
    # dominant cost) runs three times.
    sets = scope.persist(
        ex.select("doc", "shingle", dfw.alias("df"))
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("os"))
        .select(
            "doc",
            F.transform("os", lambda s: s["shingle"]).alias("sh"),
            F.size("os").alias("n"),
        )
    )
    plen = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int")
    prefix = sets.select(
        "doc", "n", F.explode(F.slice("sh", F.lit(1), plen)).alias("shingle")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (
                F.least(F.col("a.n"), F.col("b.n"))
                >= threshold * F.greatest(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sets.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("n").alias("na"))
    sb = sets.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("n").alias("nb"))
    shared = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = shared / (F.col("na") + F.col("nb") - shared)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("raw"))
        .filter(F.col("raw") >= threshold)
        .select("doc_a", "doc_b", F.round("raw", 4).alias("jaccard"))
    )


# --- MinHash + LSH ----------------------------------------------------

#: The portable md5 hash family lives in ONE place
#: (functions/portable_hash.py) shared with operators/sketches.py —
#: duplicated arithmetic here would let a future edit silently break
#: the cross-engine determinism contract in whichever copy went stale.
from ..functions.portable_hash import P30 as _P30  # noqa: E402
from ..functions.portable_hash import P60 as _P60  # noqa: E402
from ..functions.portable_hash import km_mix as _portable_mix  # noqa: E402
from ..functions.portable_hash import md5_halves as _portable_h1h2  # noqa: E402


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Per-document MinHash signature ``(doc, sig: array<bigint>)``.

    Shape chosen for whole-stage codegen: explode shingles, then ONE hash
    aggregate with ``num_hashes`` seeded ``min(xxhash64(shingle, i))``
    expressions. Map-side partial aggregation means the shuffle carries
    docs × num_hashes longs — independent of document length — and every
    expression stays inside codegen (a nested higher-order-function
    formulation runs interpreted and is ~20× slower).

    Hash family note: the classic "hash the shingle once, then
    ``num_hashes`` universal linear mixes" optimization was measured
    against this form at sf0.1 (and a hash-the-long variant) and showed
    no win — warm runs were 2.4-2.6 s for per-seed xxhash64 vs
    2.7-4.5 s for (a·h1 + b·h2 + c) mod 2^61-1 mixing: xxhash64 over
    short shingle strings is already cheap and the stage is dominated by
    the shingle explode + partial-agg shuffle, so the extra mixing
    expressions only add codegen width. Kept the simpler family.

    ``portable=True`` swaps the family to the md5-derived
    Kirsch-Mitzenmacher hashes (ONE md5 per shingle, then
    ``num_hashes`` exact-integer linear mixes — ``_portable_mix``) so
    the whole signature pipeline is replayable in DuckDB SQL — the
    oracle-gated registry path; xxhash64 remains the default for
    production throughput (measured within ~1.2× of it at sf0.1; the
    32-md5s-per-shingle formulation this replaces was ~1.5×)."""
    ex = shingle_rows(
        _spread(df.select(F.col(id_col).alias("doc"), F.col(text_col))),
        "doc",
        text_col,
        k,
    )
    if portable:
        h1, h2 = _portable_h1h2(F.col("shingle"))
        # bind the md5 halves in their own projection so the digest is
        # computed once per shingle, not once per seed expression
        ex = ex.select("doc", h1.alias("__h1"), h2.alias("__h2"))
        aggs = [
            F.min(_portable_mix(F.col("__h1"), F.col("__h2"), i)).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    else:
        aggs = [
            F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    return (
        ex.groupBy("doc")
        .agg(*aggs)
        .select("doc", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    scope: CacheScope | None = None,
    portable: bool = False,
) -> DataFrame:
    """LSH candidate pairs with estimated Jaccard: band the signature
    (rows = num_hashes // bands), bucket-join docs agreeing on any band,
    then estimate Jaccard as the fraction of agreeing signature positions.

    Scale design: the self-join keys are (band, bucket) with only doc ids
    as payload; full signatures are joined back onto the deduped pair list
    afterwards, so wide arrays never ride through the candidate shuffle.
    Shuffle volume is O(docs × bands); grows linearly, never
    quadratically.

    ``portable=True`` is the oracle-replayable variant: md5-derived
    signature family AND an exact-integer polynomial fold of the band
    slice as the bucket (``(((C·(acc≫30)) mod 2^30)·2^30 + C·(acc∧m)
    + x) mod 2^60`` per element — every intermediate < 2^61, so Java
    and DuckDB compute the SAME integers, and even the ~2^-60 bucket
    collisions are shared by both engines, keeping the value-hash
    check exact). The default (xxhash64 + murmur3 ``F.hash`` bucket)
    stays the production path."""
    # Materialized once: consumed by the band index and both sides of the
    # signature join-back. Cache lifetime is scope-managed (CacheScope).
    scope = _scope_or_default(scope)
    sig = scope.persist(
        minhash_signatures(df, id_col, text_col, num_hashes, k, portable=portable)
    )
    banded = minhash_band_table(sig, num_hashes, bands, portable=portable)
    return lsh_pairs_from_index(banded, sig, num_hashes)


def minhash_band_table(
    sig: DataFrame, num_hashes: int = 32, bands: int = 8, portable: bool = False
) -> DataFrame:
    """(doc, band, bucket): the LSH INDEX rows of a signature table —
    the persistable artifact of the near-dup store. Banding is per-doc
    (no shuffle, no cross-doc state), which is exactly what makes the
    index FOLDABLE: the band table of (old ∪ new) docs is the union of
    their band tables, so a daily batch signs + bands ONLY its own docs
    under the frozen hash-family parameters and appends
    (``minhash_index_artifact_roundtrip`` / ``incremental_minhash_equiv``
    gate this). ``portable=True`` uses the exact-integer polynomial
    bucket replayable in DuckDB (see ``minhash_lsh_pairs``)."""
    rows = num_hashes // bands

    def bucket_of(sl: Column) -> Column:
        if portable:
            C = 1000003
            return F.aggregate(
                sl,
                F.lit(0).cast("long"),
                lambda acc, x: (
                    (F.lit(C) * F.shiftright(acc, 30)) % F.lit(_P30) * F.lit(_P30)
                    + F.lit(C) * acc.bitwiseAND(F.lit(_P30 - 1))
                    + x
                )
                % F.lit(_P60),
            )
        # widened to long so the band table has ONE storage type across
        # both hash families — a persisted index written by the
        # production path must read back under the same 'bucket long'
        # schema the portable path uses (values are unchanged: a 32-bit
        # murmur3 int widens losslessly)
        return F.hash(sl).cast("long")

    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    return sig.select(
        "doc",
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    bucket_of(F.slice("sig", b * rows + 1, rows)).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_pairs_from_index(
    banded: DataFrame, sig: DataFrame, num_hashes: int = 32
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard) from an EXPLICIT band-index table —
    the entry point for querying a PERSISTED index (reloaded or folded)
    rather than one built in-session. The self-join keys are (band,
    bucket) with only doc ids as payload; full signatures join back onto
    the deduped pair list afterwards, so wide arrays never ride through
    the candidate shuffle."""
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sig.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(agree / F.lit(float(num_hashes)), 4).alias("est_jaccard"),
        )
    )


# --- Benchmark decontamination ---------------------------------------

def decontamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Training-set decontamination: flag corpus documents sharing any
    word ``k``-gram with a benchmark/eval set — the standard leakage
    check run before training on scraped data.

    Scale shape: the benchmark is small by nature (eval sets), so its
    distinct-gram index BROADCASTS; the corpus side is a map-only
    explode + broadcast-hash probe — the 100 TB corpus never shuffles.
    The only exchange is the final groupBy over MATCHED grams, a set
    proportional to the contamination (≈0 for a clean corpus), not the
    corpus. Returns ``(id_col, shared_grams, matched_bench_docs)`` for
    contaminated docs only."""
    bg = shingle_rows(benchmark, id_col, text_col, k, out_id="bench_id")
    cg = shingle_rows(corpus, id_col, text_col, k, out_id=id_col)
    return (
        cg.join(F.broadcast(bg), "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("shared_grams"),
            F.countDistinct("bench_id").alias("matched_bench_docs"),
        )
    )


# --- SimHash ----------------------------------------------------------

_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def _simhash64(text: str) -> int:
    """64-bit SimHash with md5-derived token hashes (stable across runs &
    processes; no Python hash randomization).

    Vectorized: one md5 per DISTINCT token, then the 64 bit-votes come
    from a numpy bit-matrix weighted by token frequency — identical
    signatures to the per-token/per-bit Python loop this replaces (the
    distinct-token weighting sums the same votes), without the
    O(tokens × 64) interpreter cost."""
    toks, counts = np.unique(
        np.array(py_tokens(text.lower()), dtype=object), return_counts=True
    )
    if toks.size == 0:
        return 0
    hs = np.array(
        [
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            for t in toks
        ],
        dtype=np.uint64,
    )
    shift = np.arange(64, dtype=np.uint64)
    bits = ((hs[:, None] >> shift) & np.uint64(1)).astype(np.int64)  # (T, 64)
    votes = ((2 * bits - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    out = int(((votes > 0).astype(np.uint64) << shift).sum(dtype=np.uint64))
    # wrap to signed 64-bit for LongType
    return out - (1 << 64) if out >= (1 << 63) else out


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document 64-bit SimHash via ``mapInPandas`` (Arrow-batched; the
    per-bit vote loop is the one genuinely non-relational computation in
    this module). Near-dup candidates then come from equality joins on
    signature prefixes — see ``simhash_bucket_pairs``."""
    src = _spread(df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("text")))

    def compute(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc": pdf["doc"],
                    "simhash": [_simhash64(t or "") for t in pdf["text"]],
                }
            )

    return src.mapInPandas(compute, schema=_SIMHASH_SCHEMA)


def simhash_bucket_pairs(sig: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """Candidate near-dup pairs: docs whose SimHash agrees on the top
    ``prefix_bits`` bits (one equality-join bucket per prefix; rotate the
    signature for multi-probe in a real pipeline)."""
    bucket = F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits).alias("bucket")
    b = sig.select("doc", "simhash", bucket)
    x = b.alias("x")
    y = b.alias("y")
    return (
        x.join(y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.doc") < F.col("y.doc")))
        .select(
            F.col("x.doc").alias("doc_a"),
            F.col("y.doc").alias("doc_b"),
            _hamming64(F.col("x.simhash"), F.col("y.simhash")).alias("hamming"),
        )
    )


def _hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR — bit_count is native in Spark SQL."""
    return F.bit_count(a.bitwiseXOR(b)).cast("int")


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 10,
) -> DataFrame:
    """Cross-document SEGMENT-level exact dedup with reassembly — the
    paragraph/sentence-dedup pass of a curation pipeline (Lee et al.
    2022 do it at the substring level; real pipelines usually run the
    cheaper fixed-window variant first). Each document is cut into
    consecutive ``seg_tokens``-token segments; a segment occurrence is a
    duplicate iff the identical segment text appeared earlier in corpus
    order (doc_id, then position — deterministic, retry-safe); surviving
    segments are stitched back into ``dedup_text``.

    Shape: segmentation is a per-row array slice (codegen, no shuffle);
    first-occurrence detection is ONE window over the segment text
    (equivalent to a groupBy on the segment — the only corpus-wide
    exchange, and it carries (segment, doc_id, pos) not whole
    documents); reassembly is a per-document sort-free fold:
    ``collect_list`` of (pos, seg) structs under the doc_id partition,
    ``array_sort`` for determinism, then join — the classic
    order-insensitive-collect-then-sort idiom. At 100 TB the segment
    exchange is the cost, and it is unavoidable for exact global dedup;
    shuffling an 8-byte digest per segment instead of the text is the
    production trim (same note as substring_dup_flags).

    Columns: (id, n_segments, kept_segments, dedup_text)."""
    from .text import tokens

    t = tokens(F.coalesce(F.col(text_col) if isinstance(text_col, str) else text_col, F.lit("")))
    n_seg = F.ceil(F.size(t) / F.lit(float(seg_tokens))).cast("int")
    seg_idx = F.sequence(F.lit(0), F.greatest(n_seg - 1, F.lit(0)))
    segs = F.when(F.size(t) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            seg_idx,
            lambda i: F.array_join(
                F.slice(t, i * seg_tokens + 1, seg_tokens), " "
            ),
        )
    )
    exploded = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(segs).alias("pos", "seg"),
    )
    w = Window.partitionBy("seg").orderBy("doc", "pos")
    first = exploded.withColumn("rn", F.row_number().over(w))
    kept = first.withColumn("keep", F.col("rn") == 1)
    agg = kept.groupBy("doc").agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("kept_segments"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "seg")).otherwise(None)
                    )
                ),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("dedup_text"),
    )
    return agg.select(
        F.col("doc").alias(id_col), "n_segments", "kept_segments", "dedup_text"
    )
