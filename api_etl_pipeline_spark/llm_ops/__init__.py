"""LLM-data-pipeline operators (BASELINE.json north-star extensions).

dedup.py      — exact, MinHash+LSH, SimHash, n-gram Jaccard near-dup
similarity.py — cosine top-k (brute force) + LSH-bucketed ANN
text.py       — language-ID, quality scoring, token counts, fingerprints
multimodal.py — binary-column plumbing with stubbed decoders
"""
