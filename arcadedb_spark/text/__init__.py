"""Full-text search + text analysis for large-scale document pipelines.

Reference: index/fulltext/LSMTreeFullTextIndex.java + BM25Scorer.java
(search_index / search_fields functions).  The Spark re-expression is an
inverted-index DataFrame (postings) and BM25 scoring as a pure DataFrame
computation — no per-row Python.

The analysis half (language-ID, quality scoring, token counting,
fingerprinting) extends the reference surface with the text operators a
training-data pipeline needs (BASELINE.json north star).
"""
