"""LLM-training-data pipeline operators (BASELINE.json north star).

Scale extensions beyond the reference's own surface, designed for 100 TB:

- ``text``       : tokenization, quality scoring, language ID,
                   document fingerprinting — all native Column exprs.
- ``dedup``      : exact, n-gram Jaccard, MinHash+LSH, SimHash.
- ``similarity`` : brute-force cosine top-k, LSH-bucketed ANN.
- ``multimodal`` : opaque binary columns + typed metadata, decode /
                   feature-extract plumbing as Arrow-batched stages.
- ``corpus``     : the ``Corpus``/``Vectors`` facade — subquadratic
                   routes by default, O(n²) baselines behind exact=True.
"""

from . import corpus, dedup, multimodal, similarity, text  # noqa: F401
from .corpus import Corpus, Vectors  # noqa: F401
