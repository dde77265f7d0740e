"""LLM-training-data pipeline operators (BASELINE.json north star).

Scale extensions beyond the reference's own surface, designed for 100 TB:

- ``text``       : tokenization, quality scoring, language ID,
                   document fingerprinting — all native Column exprs.
- ``dedup``      : exact, n-gram Jaccard, MinHash+LSH, SimHash.
- ``similarity`` : brute-force cosine top-k, LSH-bucketed ANN.
- ``multimodal`` : opaque binary columns + typed metadata, decode /
                   feature-extract plumbing as Arrow-batched stages.
"""

from . import dedup, multimodal, similarity, text  # noqa: F401
