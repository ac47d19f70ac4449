"""LLM-data-pipeline operators (SURVEY.md §2c / BASELINE.json north
star): deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine), similarity search, text analysis, and multimodal
column plumbing — every operator shaped for 100 TB (blocking/banding
instead of cross joins, inverted-index joins, broadcast-able probes).
"""
