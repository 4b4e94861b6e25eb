"""kNN operators: exact brute-force baseline + LSH-bucketed scale path.

Reference: function/sql/vector/SQLFunctionVectorNeighbors.java:55 (the
``vector.neighbors(idx, query, k)`` indexed function backed by HNSW).
Spark shapes:

- ``knn_exact``      — one query vector: broadcast it, score every row,
  TakeOrderedAndProject top-k.  Exact; one scan; the baseline oracle.
- ``knn_join_exact`` — k neighbors for every row of a query set:
  crossJoin + per-query window top-k.  Exact; O(|Q|·|D|) — fine for
  evaluation, not the 100 TB path.
- ``knn_lsh``        — random-hyperplane signatures (seeded, deterministic)
  bucket both sides; candidates only within matching bands, then exact
  re-rank.  The shuffle is bounded by bucket sizes — this is the scale
  path (index/vector/HnswGraphBuilder replacement at Spark scale).
- ``rrf_fuse``       — reciprocal-rank fusion of two ranked lists
  (SQLFunctionVectorRRFScore.java parity: 1/(k + rank)).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from arcadedb_spark.vector.distance import cosine_similarity, l2_distance


def knn_exact(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k rows most similar to ``query``; (id, score) ordered."""
    q = F.array(*[F.lit(float(v)) for v in query])
    if metric == "cosine":
        score = cosine_similarity(F.col(vec_col), q)
        return (
            df.select(F.col(id_col), score.alias("score"))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k)
        )
    score = l2_distance(F.col(vec_col), q)
    return (
        df.select(F.col(id_col), score.alias("score"))
        .orderBy(F.asc("score"), F.asc(id_col))
        .limit(k)
    )


def knn_join_exact(
    queries: DataFrame,
    data: DataFrame,
    q_id: str,
    q_vec: str,
    d_id: str,
    d_vec: str,
    k: int = 10,
) -> DataFrame:
    """Exact k nearest (cosine) in ``data`` for every row of ``queries``.

    crossJoin is intentional — this is the evaluation oracle.  Broadcast
    the smaller side when possible.
    """
    q = queries.select(F.col(q_id).alias("q_id"), F.col(q_vec).alias("__qv"))
    d = data.select(F.col(d_id).alias("d_id"), F.col(d_vec).alias("__dv"))
    pairs = q.crossJoin(d).withColumn(
        "score", cosine_similarity(F.col("__qv"), F.col("__dv"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("d_id"))
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("q_id", "d_id", "score", F.col("__rn").alias("rank"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec_col, planes: list[list[float]]) -> F.Column:
    """Random-hyperplane signature: one bit per plane, packed to a long."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("long")


def knn_lsh(
    queries: DataFrame,
    data: DataFrame,
    q_id: str,
    q_vec: str,
    d_id: str,
    d_vec: str,
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 12,
    n_bands: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate kNN: candidates share ≥1 LSH band, exact re-rank.

    ``n_bands`` independent signatures trade recall vs candidate count;
    the join is equi on (band, signature) so Spark shuffles only matching
    buckets — the 100 TB path.
    """
    if dim is None:
        dim = len(data.select(d_vec).first()[0])
    cands = None
    for band in range(n_bands):
        planes = _hyperplanes(dim, n_planes, seed + band)
        qb = queries.select(
            F.col(q_id).alias("q_id"),
            F.col(q_vec).alias("__qv"),
            lsh_signature(q_vec, planes).alias("__sig"),
        )
        db_ = data.select(
            F.col(d_id).alias("d_id"),
            F.col(d_vec).alias("__dv"),
            lsh_signature(d_vec, planes).alias("__sig"),
        )
        pair = qb.join(db_, "__sig").select("q_id", "d_id", "__qv", "__dv")
        cands = pair if cands is None else cands.unionByName(pair)
    cands = cands.dropDuplicates(["q_id", "d_id"])
    scored = cands.withColumn(
        "score", cosine_similarity(F.col("__qv"), F.col("__dv"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("d_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("q_id", "d_id", "score", F.col("__rn").alias("rank"))
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion: score = Σ 1/(k + rank) over input lists
    (SQLFunctionVectorRRFScore.java parity, default k=60)."""
    a = ranked_a.select(F.col(id_col).alias("id"), (1.0 / (k + F.col(rank_col))).alias("s"))
    b = ranked_b.select(F.col(id_col).alias("id"), (1.0 / (k + F.col(rank_col))).alias("s"))
    return (
        a.unionByName(b)
        .groupBy("id")
        .agg(F.sum("s").alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc("id"))
    )


def mmr_rerank(
    scored: DataFrame,
    id_col: str,
    vec_col: str,
    score_col: str = "score",
    k: int = 10,
    lambda_: float = 0.5,
    pool: int = 50,
) -> list:
    """Maximal-marginal-relevance re-ranking
    (SQLFunctionVectorMMRScore.java parity): greedily pick argmax of
    λ·relevance − (1−λ)·max-similarity-to-selected.

    The greedy loop is inherently sequential over k picks, so it runs on
    the driver over a bounded candidate ``pool`` (collected once) — the
    heavy scoring stays distributed upstream.  Returns ordered
    [(id, mmr_score)].
    """
    import numpy as np

    rows = (
        scored.orderBy(F.desc(score_col), F.asc(id_col)).limit(pool).collect()
    )
    if not rows:
        return []
    ids = [r[id_col] for r in rows]
    rel = np.array([float(r[score_col]) for r in rows])
    vecs = np.array([[float(x) for x in r[vec_col]] for r in rows])
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    sim = unit @ unit.T

    selected: list[int] = []
    out = []
    candidates = set(range(len(ids)))
    for _ in range(min(k, len(ids))):
        best_i, best_v = None, -float("inf")
        for i in sorted(candidates):
            penalty = max((sim[i][j] for j in selected), default=0.0)
            v = lambda_ * rel[i] - (1 - lambda_) * penalty
            if v > best_v:
                best_i, best_v = i, v
        selected.append(best_i)
        candidates.discard(best_i)
        out.append((ids[best_i], float(best_v)))
    return out
