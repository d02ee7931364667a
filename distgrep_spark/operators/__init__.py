"""Operators: the engine's verb set.

- ``grep``       — the reference's entire query surface, generalized.
- ``dedup``      — exact / hash / n-gram-Jaccard / MinHash-LSH / SimHash.
- ``similarity`` — cosine top-k, LSH-bucketed ANN over embeddings.
- ``text``       — token counts, quality scores, language ID, fingerprints.
- ``multimodal`` — binary-column (image/audio) plumbing, decode stubbed.
"""
