"""Sparse vectors as (indices, values, dims) structs.

Parity: function/sql/vector/SparseVector.java (indices/values/dims
representation, dotProduct :142, magnitude :164, normalize :175) and the
SQL surface SQLFunctionVector{SparseCreate,DenseToSparse,SparseToDense,
SparseDot,Sparsity}.java.  The LSM sparse-vector index
(index/sparsevector/LSMSparseVectorIndex.java) is an OLTP structure we
replace with scans: sparse columns stay columnar in parquet and dot
products run in codegen.

All pure Column expressions.  Lookup joins use ``map_from_arrays`` —
O(nnz_a) per pair with map probing, the right shape when vectors are
genuinely sparse.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sparse_create(indices, values, dims) -> Column:
    """struct(indices: array<int>, values: array<double>, dims: int)
    (SQLFunctionVectorSparseCreate.java)."""
    d = F.lit(dims) if isinstance(dims, int) else _c(dims)
    return F.struct(
        _c(indices).cast("array<int>").alias("indices"),
        _c(values).cast("array<double>").alias("values"),
        d.cast("int").alias("dims"),
    )


def dense_to_sparse(vec, threshold=0.0) -> Column:
    """Keep entries with |v| > threshold
    (SQLFunctionVectorDenseToSparse.java:78-84)."""
    v = _c(vec).cast("array<double>")
    thr = threshold if isinstance(threshold, Column) else F.lit(float(threshold))
    pairs = F.filter(
        F.transform(v, lambda x, i: F.struct(i.alias("i"), x.alias("x"))),
        lambda p: F.abs(p["x"]) > thr,
    )
    return F.struct(
        F.transform(pairs, lambda p: p["i"]).alias("indices"),
        F.transform(pairs, lambda p: p["x"]).alias("values"),
        F.size(v).alias("dims"),
    )


def sparse_to_dense(sv) -> Column:
    """Inverse of ``dense_to_sparse`` — missing positions are 0.0
    (SparseVector.toDense :131)."""
    s = _c(sv)
    m = F.map_from_arrays(s["indices"], s["values"])
    idx = F.sequence(F.lit(0), F.greatest(s["dims"] - 1, F.lit(0)))
    return F.when(s["dims"] == 0, F.array().cast("array<double>")).otherwise(
        F.transform(idx, lambda i: F.coalesce(F.try_element_at(m, i), F.lit(0.0)))
    )


def sparse_dot(a, b) -> Column:
    """Σ a[i]·b[i] over shared indices (SparseVector.dotProduct :142)."""
    sa, sb = _c(a), _c(b)
    mb = F.map_from_arrays(sb["indices"], sb["values"])
    prods = F.zip_with(
        sa["indices"],
        sa["values"],
        lambda i, v: v * F.coalesce(F.try_element_at(mb, i), F.lit(0.0)),
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def sparse_magnitude(sv) -> Column:
    """L2 norm over stored values (SparseVector.magnitude :164)."""
    s = _c(sv)
    return F.sqrt(
        F.aggregate(s["values"], F.lit(0.0), lambda acc, v: acc + v * v)
    )


def sparse_normalize(sv) -> Column:
    """Unit-magnitude copy; zero vectors pass through unchanged
    (SparseVector.normalize :175)."""
    s = _c(sv)
    mag = sparse_magnitude(s)
    return F.when(mag == 0, s).otherwise(
        F.struct(
            s["indices"].alias("indices"),
            F.transform(s["values"], lambda v: v / sparse_magnitude(s)).alias(
                "values"
            ),
            s["dims"].alias("dims"),
        )
    )


def sparse_cosine(a, b) -> Column:
    """Cosine over sparse structs (SQLFunctionVectorSparseNeighbors
    scoring)."""
    return sparse_dot(a, b) / (sparse_magnitude(a) * sparse_magnitude(b))


def sparsity(vec) -> Column:
    """Fraction of zero entries of a *dense* vector
    (SQLFunctionVectorSparsity.java)."""
    v = _c(vec)
    zeros = F.size(F.filter(v, lambda x: x == 0))
    return F.when(F.size(v) == 0, F.lit(0.0)).otherwise(
        zeros.cast("double") / F.size(v)
    )
