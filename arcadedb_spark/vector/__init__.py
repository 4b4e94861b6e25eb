"""Vector search: distances, exact kNN, LSH-bucketed ANN.

Reference: index/vector/LSMVectorIndex.java (jVector HNSW, LSM-staged,
quantization) + function/sql/vector/*.java (51 files: distances,
normalize, quantize, neighbors, RRF/MMR hybrid scoring).  Spark has no
HNSW; the scalable shapes are brute-force top-k (exact, one pass) and
random-hyperplane LSH bucketing (approximate, shuffle-bounded) —
SURVEY.md §2.9 maps vector.neighbors to exactly these.
"""

from arcadedb_spark.vector.distance import (
    cosine_similarity,
    dot_product,
    l1_distance,
    l2_distance,
    linf_distance,
    normalize,
)
from arcadedb_spark.vector.knn import knn_exact, knn_join_exact, knn_lsh, rrf_fuse

__all__ = [
    "cosine_similarity", "dot_product", "l1_distance", "l2_distance",
    "linf_distance", "normalize", "knn_exact", "knn_join_exact", "knn_lsh",
    "rrf_fuse",
]
