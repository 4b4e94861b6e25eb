"""Quantization, sparse vectors, IVF ANN (vector/quantize.py, sparse.py,
ivf.py — reference SQLFunctionVectorQuantize*/Sparse*, LSMVectorIndex)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from arcadedb_spark.vector import (
    binary_hamming,
    dense_to_sparse,
    dequantize_binary,
    dequantize_int8,
    ivf_build,
    ivf_search,
    ivf_search_join,
    knn_exact,
    quantize_binary,
    quantize_int8,
    sparse_cosine,
    sparse_dot,
    sparse_magnitude,
    sparse_normalize,
    sparse_to_dense,
    sparsity,
)


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [
            (1, [0.1, 0.5, 0.9, -0.3]),
            (2, [1.0, 1.0, 1.0, 1.0]),
            (3, [0.0, 0.0, 2.0, 0.0]),
        ],
        "id long, v array<float>",
    )


def test_quantize_int8_matches_reference_formula(vecs):
    rows = {
        r["id"]: r
        for r in vecs.select(
            "id", quantize_int8("v").alias("q")
        ).collect()
    }
    # reference: round((v-min)/(max-min)*255)-128 (Math.round = floor(x+.5))
    v = np.array([0.1, 0.5, 0.9, -0.3])
    expect = [
        int(np.floor((x - v.min()) / (v.max() - v.min()) * 255 + 0.5)) - 128
        for x in v
    ]
    assert list(rows[1]["q"]["quantized"]) == expect
    # all-equal vector maps to 0 (QuantizeInt8.java:79-81)
    assert list(rows[2]["q"]["quantized"]) == [0, 0, 0, 0]


def test_int8_roundtrip_error_bound(vecs):
    err = vecs.select(
        F.array_max(
            F.zip_with(
                dequantize_int8(quantize_int8("v")),
                F.col("v").cast("array<double>"),
                lambda a, b: F.abs(a - b),
            )
        ).alias("e"),
        (F.array_max(F.col("v")) - F.array_min(F.col("v"))).alias("range"),
    ).collect()
    for r in err:
        assert r["e"] <= r["range"] / 255 + 1e-9


def test_quantize_binary_bits_and_hamming(vecs):
    rows = {
        r["id"]: r
        for r in vecs.select("id", quantize_binary("v").alias("b")).collect()
    }
    # median of [0.1,0.5,0.9,-0.3] = 0.3 → bits 0110 LSB-first → 6
    assert list(rows[1]["b"]["packed"]) == [6]
    assert rows[1]["b"]["median"] == pytest.approx(0.3)
    assert rows[1]["b"]["dims"] == 4
    ham = vecs.select(
        binary_hamming(quantize_binary("v"), quantize_binary("v")).alias("h")
    ).collect()
    assert all(r["h"] == 0 for r in ham)
    deq = vecs.filter(F.col("id") == 1).select(
        dequantize_binary(quantize_binary("v")).alias("d")
    ).first()["d"]
    assert deq == [-1.0, 1.0, 1.0, -1.0]


def test_sparse_roundtrip_and_dot(vecs):
    rows = vecs.select(
        "id",
        dense_to_sparse("v", 0.2).alias("s"),
        F.col("v").cast("array<double>").alias("dv"),
    ).select(
        "id", "s", sparse_to_dense("s").alias("back"), "dv",
        sparsity(F.col("dv")).alias("z"),
    ).collect()
    by_id = {r["id"]: r for r in rows}
    assert by_id[3]["s"]["indices"] == [2]
    assert by_id[3]["z"] == pytest.approx(0.75)
    # threshold 0 roundtrips exactly for no-zero vectors
    exact = vecs.select(
        F.col("v").cast("array<double>").alias("dv"),
        sparse_to_dense(dense_to_sparse("v", 0.0)).alias("back"),
    ).collect()
    for r in exact:
        orig = [x if x != 0 else 0.0 for x in r["dv"]]
        assert r["back"] == pytest.approx(orig)
    # sparse dot == dense dot at threshold 0
    dots = vecs.alias("a").crossJoin(vecs.alias("b")).select(
        sparse_dot(
            dense_to_sparse(F.col("a.v"), 0.0), dense_to_sparse(F.col("b.v"), 0.0)
        ).alias("sd"),
        F.aggregate(
            F.zip_with(
                F.col("a.v").cast("array<double>"),
                F.col("b.v").cast("array<double>"),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, p: acc + p,
        ).alias("dd"),
    ).collect()
    for r in dots:
        assert r["sd"] == pytest.approx(r["dd"])


def test_sparse_normalize_and_cosine(vecs):
    n = vecs.select(
        sparse_magnitude(sparse_normalize(dense_to_sparse("v", 0.0))).alias("m")
    ).collect()
    assert all(r["m"] == pytest.approx(1.0) for r in n)
    c = vecs.filter(F.col("id") == 2).select(
        sparse_cosine(
            dense_to_sparse("v", 0.0), dense_to_sparse("v", 0.0)
        ).alias("c")
    ).first()["c"]
    assert c == pytest.approx(1.0)


def test_ivf_recall_and_exact_fallback(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    idx = ivf_build(emb, "vec_id", "embedding", n_lists=8, seed=42)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in knn_exact(emb, "embedding", q, k=10).collect()]
    # probing every cell must reproduce the exact result
    full = [
        r["vec_id"] for r in ivf_search(idx, q, k=10, nprobe=8).collect()
    ]
    assert full == exact
    # partial probe keeps decent recall on the fixture
    approx = [
        r["vec_id"] for r in ivf_search(idx, q, k=10, nprobe=4).collect()
    ]
    assert len(set(approx) & set(exact)) >= 6
    # batch variant returns k rows per query with ranks 1..k
    j = ivf_search_join(idx, emb.limit(3), "vec_id", "embedding", k=5, nprobe=8)
    got = j.groupBy("q_id").agg(F.count("*").alias("n"), F.max("rank").alias("mr")).collect()
    assert all(r["n"] == 5 and r["mr"] == 5 for r in got)


def test_vector_sql_namespace_quantize_sparse(db):
    out = db.query(
        "SELECT vec_id, vector.sparsity(embedding) AS z, "
        "vector.sparseDot(vector.denseToSparse(embedding), "
        "vector.denseToSparse(embedding)) AS sd "
        "FROM embeddings LIMIT 5"
    ).collect()
    assert len(out) == 5
    assert all(r["sd"] >= 0 for r in out)


def test_ann_recall_at_k_driver_settings(spark):
    """The approximate paths must keep recall@5 >= 0.9 vs the exact kernel
    at the parameters the driver entries use (q_knn_lsh, q_knn_ivf)."""
    from arcadedb_spark.vector import knn_lsh
    from arcadedb_spark.vector.knn import knn_join_exact

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["q_id"], r["d_id"])
        for r in knn_join_exact(
            queries, emb, "vec_id", "embedding", "vec_id", "embedding", k=5
        ).collect()
    }
    lsh = {
        (r["q_id"], r["d_id"])
        for r in knn_lsh(
            queries, emb, "vec_id", "embedding", "vec_id", "embedding",
            k=5, n_planes=4, n_bands=24,
        ).collect()
    }
    assert len(lsh & exact) / len(exact) >= 0.9

    idx = ivf_build(emb, "vec_id", "embedding", n_lists=16, seed=42)
    ivf = {
        (r["q_id"], r["d_id"])
        for r in ivf_search_join(
            idx, queries, "vec_id", "embedding", k=5, nprobe=8
        ).collect()
    }
    assert len(ivf & exact) / len(exact) >= 0.9


def test_pq_recall_and_rerank(spark):
    """PQ ADC recall floor + exact top-k recovery via re-rank
    (vector/pq.py; reference jVector PQ quantization mode)."""
    from pyspark.sql import functions as F

    from arcadedb_spark.vector.knn import knn_exact
    from arcadedb_spark.vector.pq import pq_build, pq_search

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()
    idx = pq_build(emb, "vec_id", "embedding", m=8, k=16)
    idx.codes = idx.codes.cache()
    hits_adc = hits_ref = 0
    queries = [r["embedding"] for r in emb.orderBy("vec_id").limit(5).collect()]
    for q in queries:
        qf = [float(x) for x in q]
        truth = {
            r["vec_id"]
            for r in knn_exact(emb, "embedding", qf, k=5, metric="l2").collect()
        }
        adc = {r["id"] for r in pq_search(idx, qf, k=5).collect()}
        ref = {
            r["id"]
            for r in pq_search(
                idx, qf, k=5, refine=80, data=emb,
                id_col="vec_id", vec_col="embedding",
            ).collect()
        }
        hits_adc += len(adc & truth)
        hits_ref += len(ref & truth)
    assert hits_adc / 25 >= 0.3   # raw ADC floor (coarse codes)
    assert hits_ref / 25 >= 0.8  # re-rank recovers nearly everything
    # compression: 8 int codes per 64-float vector
    row = idx.codes.first()
    assert len(row["codes"]) == 8
