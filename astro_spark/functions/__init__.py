"""LLM-data-pipeline function layer (beyond-reference operators).

- ``text``: tokenization, quality metrics, language-ID, fingerprints
- ``dedup``: exact, MinHash+LSH, SimHash, exact n-gram Jaccard
- ``similarity``: brute-force cosine top-k, hyperplane-LSH ANN
- ``multimodal``: binary-column plumbing with Arrow-batched extraction

All numeric parameters live in ``constants`` so SQL oracles reproduce
results exactly.
"""

from . import (
    constants,
    dedup,
    events,
    linalg,
    multimodal,
    similarity,
    sketches,
    text,
)

__all__ = [
    "constants",
    "dedup",
    "events",
    "linalg",
    "multimodal",
    "similarity",
    "sketches",
    "text",
]
