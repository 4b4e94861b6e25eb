"""Deduplication operators for training-data pipelines.

Not in the reference's surface — added per the north star (BASELINE.json):
a 100 TB corpus pipeline needs exact dedup, MinHash-LSH, SimHash and
n-gram-Jaccard near-dup detection as first-class engine operators.

All operators are shuffle-bounded DataFrame programs: hashing and
signatures are JVM built-ins (xxhash64/md5/bit ops), candidate
generation is an equi-join on buckets — never an O(n²) comparison.
"""

from arcadedb_spark.dedup.exact import exact_duplicates, dedup_exact
from arcadedb_spark.dedup.minhash import minhash_signatures, minhash_duplicate_pairs
from arcadedb_spark.dedup.simhash import simhash, simhash_duplicate_pairs
from arcadedb_spark.dedup.ngram import ngram_jaccard_pairs

__all__ = [
    "exact_duplicates", "dedup_exact", "minhash_signatures",
    "minhash_duplicate_pairs", "simhash", "simhash_duplicate_pairs",
    "ngram_jaccard_pairs",
]
