"""Product Quantization (PQ) ANN: subspace codebooks + ADC scoring.

Reference: index/vector/LSMVectorIndex.java ships jVector's quantization
modes (PQ / int8 / binary); quantize.py covers int8/binary — this module
adds the PQ mode: vectors split into ``m`` subspaces, each encoded as the
id of its nearest subspace centroid (k per codebook), so an
n×dim float corpus compresses to n×m small ints (e.g. 64 floats → 8
bytes at m=8).  Queries score via ADC (asymmetric distance computation):
a per-query lookup table of query-subvector→centroid distances, summed
by code — no decompression.

Spark shape (100-TB posture):
- TRAIN: one KMeans per subspace over a bounded sample (pyspark.ml,
  distributed) — codebooks are tiny (m·k·dsub floats) and ride to
  executors as Arrow-batch closures.
- ENCODE: vectorized numpy argmin inside ``mapInPandas`` (Arrow batches;
  a Column-expression argmin over m·k centroids would codegen-explode).
  One pass, partition-preserving, no shuffle.
- SEARCH: the ADC lookup table is built driver-side (m·k floats) and
  embedded as array literals; the scan is ``m`` element_at lookups + a
  sum per row — whole-stage codegen, TakeOrderedAndProject top-k.
  Optional exact re-rank joins the float vectors for the top
  ``refine`` candidates only (the standard PQ + re-rank pipeline).

Determinism: fixed KMeans seed; same corpus → same codebooks/codes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PQIndex:
    m: int                      # subspaces
    k: int                      # centroids per codebook
    dim: int
    codebooks: "list[list[list[float]]]"  # [m][k][dim/m]
    codes: DataFrame            # (id, codes array<int>)


def pq_build(
    data: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    k: int = 64,
    seed: int = 42,
    train_sample: int = 100_000,
) -> PQIndex:
    """Train per-subspace codebooks and encode the corpus."""
    first = data.select(vec_col).first()
    if first is None:
        raise ValueError("pq_build: empty corpus")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"pq_build: dim {dim} not divisible by m={m}")
    dsub = dim // m

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # bounded training sample (KMeans over 100 TB is wasteful and
    # unnecessary — codebook quality saturates quickly)
    n = data.count()
    train = data.select(vec_col)
    if n > train_sample:
        train = train.sample(fraction=train_sample / n, seed=seed)
    train = train.cache()

    codebooks: list = []
    for i in range(m):
        sub = train.select(
            array_to_vector(
                F.slice(F.col(vec_col), i * dsub + 1, dsub)
                .cast("array<double>")
            ).alias("__fv")
        )
        km = KMeans(k=k, seed=seed + i, featuresCol="__fv", maxIter=10)
        model = km.fit(sub)
        codebooks.append([[float(x) for x in c] for c in model.clusterCenters()])
    train.unpersist()

    cb = np.asarray(codebooks, dtype=np.float64)  # (m, k, dsub)

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.stack(pdf[vec_col].map(np.asarray))  # (n, dim)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for i in range(m):
                sub = vecs[:, i * dsub:(i + 1) * dsub]  # (n, dsub)
                # ||x-c||² argmin via -2x·c + ||c||² (x² constant per row)
                d = -2.0 * sub @ cb[i].T + (cb[i] ** 2).sum(axis=1)
                codes[:, i] = d.argmin(axis=1)
            yield pd.DataFrame({"id": pdf[id_col], "codes": list(codes)})

    codes_df = data.select(id_col, vec_col).mapInPandas(
        encode, "id long, codes array<int>"
    )
    return PQIndex(m=m, k=k, dim=dim, codebooks=codebooks, codes=codes_df)


def pq_search(
    index: PQIndex,
    query: "list[float]",
    k: int = 10,
    refine: int = 0,
    data: DataFrame | None = None,
    id_col: str = "id",
    vec_col: str = "vector",
    metric: str = "l2",
) -> DataFrame:
    """Top-k by ADC distance; ``refine`` > 0 re-ranks that many ADC
    candidates exactly against the float vectors (requires ``data``).

    Returns (id, distance) ascending.
    """
    q = np.asarray(query, dtype=np.float64)
    if len(q) != index.dim:
        raise ValueError("query dimension mismatch")
    dsub = index.dim // index.m
    cb = np.asarray(index.codebooks)  # (m, k, dsub)
    # ADC lookup table: distance from each query subvector to each
    # centroid — m·k floats, embedded as codegen reference literals
    lut = np.stack([
        ((cb[i] - q[i * dsub:(i + 1) * dsub]) ** 2).sum(axis=1)
        for i in range(index.m)
    ])  # (m, k)
    dist = None
    for i in range(index.m):
        term = F.element_at(
            F.lit([float(x) for x in lut[i]]),
            F.element_at("codes", i + 1) + 1,
        )
        dist = term if dist is None else dist + term
    scored = index.codes.select("id", dist.alias("distance"))
    if refine <= 0:
        return scored.orderBy(F.asc("distance"), F.asc("id")).limit(k)
    if data is None:
        raise ValueError("refine re-rank needs the float-vector frame")
    cand = scored.orderBy(F.asc("distance"), F.asc("id")).limit(refine)
    qcol = F.array(*[F.lit(float(v)) for v in q])
    exact = (
        data.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v"))
        .join(F.broadcast(cand.select("id")), "id")
        .select(
            "id",
            F.aggregate(
                F.zip_with(
                    F.col("__v").cast("array<double>"), qcol,
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("distance"),
        )
    )
    return exact.orderBy(F.asc("distance"), F.asc("id")).limit(k)
