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
from arcadedb_spark.vector.ivf import IVFIndex, ivf_build, ivf_search, ivf_search_join
from arcadedb_spark.vector.knn import knn_exact, knn_join_exact, knn_lsh, rrf_fuse
from arcadedb_spark.vector.quantize import (
    binary_hamming,
    dequantize_binary,
    dequantize_int8,
    quantize_binary,
    quantize_int8,
)
from arcadedb_spark.vector.sparse import (
    dense_to_sparse,
    sparse_cosine,
    sparse_create,
    sparse_dot,
    sparse_magnitude,
    sparse_normalize,
    sparse_to_dense,
    sparsity,
)

__all__ = [
    "cosine_similarity", "dot_product", "l1_distance", "l2_distance",
    "linf_distance", "normalize", "knn_exact", "knn_join_exact", "knn_lsh",
    "rrf_fuse",
    "quantize_int8", "dequantize_int8", "quantize_binary", "dequantize_binary",
    "binary_hamming",
    "sparse_create", "dense_to_sparse", "sparse_to_dense", "sparse_dot",
    "sparse_cosine", "sparse_magnitude", "sparse_normalize", "sparsity",
    "IVFIndex", "ivf_build", "ivf_search", "ivf_search_join",
]
