"""``Corpus`` — the one-handle facade over the LLM-pipeline operators.

Routing policy (the point of this module): **every default route is
subquadratic**. The exact O(n²) formulations (`similarity.near_dup_pairs`,
brute-force all-pairs Jaccard verification of the full pair space) exist
as named baselines and re-rank stages, but an `Archive`-level caller who
writes ``corpus.near_dup_text_pairs()`` or ``vectors.near_dups()`` gets
the LSH/banded path — at 100 TB the default must be the plan that
bounds the candidate space, and the quadratic twin is an explicit
``exact=True`` opt-in for validation runs at small scale.

Dedup semantics: ``drop_near_dups`` removes every document that appears
as the GREATER id of any candidate pair (lowest-id-wins, the standard
greedy policy in training-data pipelines — deterministic, one pass, no
iterative connected components; a doc chained A<B<C keeps only A, which
over-removes relative to true clustering but never under-removes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cluster as C
from . import dedup as D
from . import packing as P
from . import rarity as R
from . import sampling as SA
from . import similarity as S
from . import text as T


class Corpus:
    """A document corpus ``(id, text)`` with subquadratic-by-default ops."""

    def __init__(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
        self.docs = docs
        self.id_col = id_col
        self.text_col = text_col

    # -- text analysis (map-only, native Column exprs) ---------------------

    def annotated(self) -> DataFrame:
        """id + token_count/quality/lang — one pass, no shuffle."""
        return self.docs.select(
            F.col(self.id_col),
            T.token_count(self.text_col).alias("token_count"),
            T.quality_score(self.text_col).alias("quality_score"),
            T.lang_id(self.text_col).alias("lang"),
        )

    # -- dedup -------------------------------------------------------------

    def exact_dedup(self) -> DataFrame:
        """Canonical rows only (content-fingerprint groupBy; shuffles
        16-byte fingerprints, not bodies)."""
        flags = D.exact_dedup_flags(self.docs, self.id_col, self.text_col)
        keep = flags.filter(F.col("is_canonical") == 1).select(self.id_col)
        return self.docs.join(keep, self.id_col, "left_semi")

    def near_dup_text_pairs(
        self,
        threshold: float = 0.5,
        exact: bool = False,
        num_hashes: int = 32,
        bands: int = 16,
        k: int = 3,
        scope: D.CacheScope | None = None,
    ) -> DataFrame:
        """Candidate near-dup pairs ``(doc_a, doc_b, similarity)``.

        Default: MinHash+LSH banding — O(docs × bands) shuffle,
        ``est_jaccard`` filtered at ``threshold``. ``exact=True`` opts
        into AllPairs prefix-filtered TRUE Jaccard (`dedup.jaccard_pairs`
        — still subquadratic in practice, but its verify stage touches
        every candidate's full shingle set, so it is the validation
        path, not the default)."""
        if exact:
            return D.jaccard_pairs(
                self.docs, self.id_col, self.text_col,
                k=k, threshold=threshold, scope=scope,
            ).withColumnRenamed("jaccard", "similarity")
        return D.minhash_lsh_pairs(
            self.docs, self.id_col, self.text_col,
            num_hashes=num_hashes, bands=bands, k=k, scope=scope,
        ).filter(F.col("est_jaccard") >= threshold).withColumnRenamed(
            "est_jaccard", "similarity"
        )

    def drop_near_dups(
        self, threshold: float = 0.9, clustered: bool = False, **kw
    ) -> DataFrame:
        """Corpus minus near-duplicates.

        Default (greedy): every doc appearing as the GREATER id of any
        pair is dropped — one pass, but a chain A~B~C keeps only A even
        when A and C are not actually similar (over-removal).
        ``clustered=True`` runs connected components over the pair graph
        first and keeps exactly one canonical doc per cluster — the
        correct semantics, for a few extra keyed shuffles per CC round."""
        pairs = self.near_dup_text_pairs(threshold=threshold, **kw)
        if clustered:
            labels = C.connected_components(pairs, "doc_a", "doc_b")
            keep = C.dedup_keep_list(self.docs, self.id_col, labels).select(
                self.id_col
            )
            return self.docs.join(keep, self.id_col, "left_semi")
        losers = pairs.select(F.col("doc_b").alias(self.id_col)).distinct()
        return self.docs.join(losers, self.id_col, "left_anti")

    def dup_clusters(self, threshold: float = 0.5, **kw) -> DataFrame:
        """(node, component) labels for every doc in a near-dup cluster —
        the transitive closure of near_dup_text_pairs via large-star/
        small-star connected components."""
        pairs = self.near_dup_text_pairs(threshold=threshold, **kw)
        return C.connected_components(pairs, "doc_a", "doc_b")

    # -- sampling / splits / mixing (hash-deterministic, shuffle-free) -----

    def split(
        self, splits: list[tuple[str, float]] | None = None
    ) -> DataFrame:
        """Disjoint deterministic split assignment (default 80/10/10
        train/valid/test) — stable across runs and engines."""
        return SA.split_assign(
            self.docs,
            self.id_col,
            splits or [("train", 0.8), ("valid", 0.1), ("test", 0.1)],
        )

    def sample(self, rate: float, by: str | None = None,
               rates: dict[str, float] | None = None) -> DataFrame:
        """Uniform (or per-stratum, when ``by``/``rates`` given)
        deterministic sample."""
        if by is not None:
            return SA.stratified_sample(
                self.docs, self.id_col, by, rates or {}, default_rate=rate
            )
        return SA.deterministic_sample(self.docs, self.id_col, rate)

    def weighted_sample(self, n: int, weight_col: str) -> DataFrame:
        """Deterministic A-Res weighted sample without replacement
        (see sampling.weighted_sample) — e.g. length-weighted doc picks."""
        return SA.weighted_sample(self.docs, self.id_col, weight_col, n)

    def mix_epochs(
        self, by: str, factors: dict[str, float], default_factor: float = 1.0
    ) -> DataFrame:
        """Epoch-weighted training mixture (see sampling.mix_epochs)."""
        return SA.mix_epochs(
            self.docs, self.id_col, by, factors, default_factor=default_factor
        )

    # -- shaping -----------------------------------------------------------

    def chunks(self, size: int = 500, stride: int = 400) -> DataFrame:
        """(id, chunk_idx, chunk_text) overlapping context windows."""
        return self.docs.where(F.length(self.text_col) > 0).select(
            F.col(self.id_col),
            F.posexplode(T.chunks(self.text_col, size=size, stride=stride)).alias(
                "chunk_idx", "chunk_text"
            ),
        )

    def rarity(self, hot_min: int = 64) -> DataFrame:
        """Per-doc unigram-LM rarity report (the model-free perplexity
        gate; heavy-hitter split join — see llm/rarity.py)."""
        return R.unigram_rarity(
            self.docs.select(
                F.col(self.id_col).alias("doc_id"),
                F.col(self.text_col).alias("text"),
            ),
            hot_min=hot_min,
        )

    def tfidf_terms(self, k: int = 3, hot_min: int = 64) -> DataFrame:
        """Top-k characteristic terms per doc (integer-exact TF-IDF)."""
        return R.tfidf_top_terms(
            self.docs.select(
                F.col(self.id_col).alias("doc_id"),
                F.col(self.text_col).alias("text"),
            ),
            k=k,
            hot_min=hot_min,
        )

    def segment_dedup(self, seg_tokens: int = 10) -> DataFrame:
        """Cross-doc segment-level exact dedup with reassembly
        (paragraph-dedup pass; llm/dedup.py segment_dedup)."""
        return D.segment_dedup(
            self.docs, self.id_col, self.text_col, seg_tokens=seg_tokens
        )

    def heavy_hitters(self, k: int = 32) -> DataFrame:
        """Words in more than 1/k of all token positions, EXACT, via the
        Misra-Gries candidate pass (operators/heavy_hitters.py) — no
        full-vocabulary shuffle."""
        from ..operators.heavy_hitters import exact_heavy_hitters
        from . import rarity as R_

        occ = R_.word_occurrences(
            self.docs.select(
                F.col(self.id_col).alias("doc_id"),
                F.col(self.text_col).alias("text"),
            )
        )
        return exact_heavy_hitters(occ, "w", k=k)

    def vocab_coverage(self, cuts: tuple = (10, 100, 1000)) -> DataFrame:
        """Token-mass coverage of the top-k vocabulary head per cut."""
        from . import rarity as R_

        return R_.vocab_coverage(
            self.docs.select(
                F.col(self.id_col).alias("doc_id"),
                F.col(self.text_col).alias("text"),
            ),
            cuts=cuts,
        )

    def scrubbed(self) -> DataFrame:
        """Corpus with email/phone PII redacted (typed placeholders)."""
        return self.docs.withColumn(self.text_col, T.scrub_pii(self.text_col))

    def packed(self, capacity: int, num_buckets: int = 32) -> DataFrame:
        """(id, packed_len, bin_id) — bucketed FFD sequence packing of
        token counts into ``capacity``-token training bins."""
        with_len = self.docs.select(
            F.col(self.id_col), T.token_count(self.text_col).alias("_n_tok")
        )
        return P.pack_sequences(
            with_len, self.id_col, "_n_tok", capacity, num_buckets=num_buckets
        )


class Vectors:
    """An embedding corpus ``(id, array<float>)`` with ANN-by-default ops."""

    def __init__(
        self,
        emb: DataFrame,
        dim: int,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.emb = emb
        self.dim = dim
        self.id_col = id_col
        self.vec_col = vec_col

    def centroids(self, label_col: str = "label", scale: int = 1000) -> DataFrame:
        """Per-label fixed-point centroids (bit-reproducible — see
        similarity.label_centroids). Requires ``label_col`` on emb."""
        src = self.emb.select(
            F.col(label_col).alias("label"),
            F.col(self.id_col).alias("vec_id"),
            F.col(self.vec_col).alias("embedding"),
        )
        return S.label_centroids(src, scale=scale)

    def near_dups(
        self,
        threshold: float = 0.9,
        exact: bool = False,
        n_planes: int = 8,
        probe_bits: int = 1,
    ) -> DataFrame:
        """Cosine near-dup pairs. Default: multi-probe hyperplane LSH
        (bucketed candidates, exact cosine verify inside buckets —
        precision 1, recall tuned by n_planes/probe_bits). ``exact=True``
        opts into the O(n²) all-pairs baseline for validation at small
        scale."""
        if exact:
            return S.near_dup_pairs(
                self.emb, threshold=threshold,
                id_col=self.id_col, vec_col=self.vec_col,
            )
        return S.lsh_near_dup_pairs(
            self.emb, dim=self.dim, threshold=threshold,
            n_planes=n_planes, probe_bits=probe_bits,
            id_col=self.id_col, vec_col=self.vec_col,
        )

    def ann_topk(
        self,
        query_df: DataFrame,
        k: int = 10,
        exact: bool = False,
        n_centroids: int = 16,
        nprobe: int = 4,
        kmeans_iters: int = 0,
    ) -> DataFrame:
        """Top-k for one query vector. Default: IVF probe (broadcast
        centroid fold, scans ~nprobe/n_centroids of the corpus);
        ``kmeans_iters > 0`` refines the quantizer first. ``exact=True``
        is the brute-force scan (also the re-rank baseline)."""
        if exact:
            return S.cosine_topk(
                self.emb, query_df, k=k, id_col=self.id_col, vec_col=self.vec_col
            )
        cents = (
            S.kmeans_centroids(
                self.emb, n_centroids=n_centroids, n_iter=kmeans_iters,
                id_col=self.id_col, vec_col=self.vec_col,
            )
            if kmeans_iters > 0
            else None
        )
        return S.ivf_ann_topk(
            self.emb, query_df, n_centroids=n_centroids, nprobe=nprobe, k=k,
            id_col=self.id_col, vec_col=self.vec_col, centroids=cents,
        )

    def knn_join(self, queries: DataFrame, k: int = 3) -> DataFrame:
        """Top-k per query row (broadcast query side — intended for query
        sets that fit in a broadcast; for corpus×corpus use near_dups)."""
        return S.knn_join(
            self.emb, queries, k=k, id_col=self.id_col, vec_col=self.vec_col
        )
