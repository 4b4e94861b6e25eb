"""Text / vector / dedup operator tests (sf0.001)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_bm25_self_consistency(db):
    from arcadedb_spark.text.fulltext import bm25_search, build_postings

    docs = db.table("documents")
    out = bm25_search(docs, "doc_id", "text", "fast join").orderBy(
        F.desc("score")
    )
    rows = out.collect()
    assert rows and all(r["score"] > 0 for r in rows)
    # every scored doc contains at least one query term
    postings = build_postings(docs, "doc_id", "text")
    hit_docs = {
        r["doc_id"]
        for r in postings.filter(F.col("term").isin(["fast", "join"])).select("doc_id").distinct().collect()
    }
    assert {r["doc_id"] for r in rows} <= hit_docs


def test_bm25_reference_formula(db):
    """Hand-check one document's score against BM25Scorer.java math."""
    from arcadedb_spark.text.fulltext import (
        bm25_search, build_postings, doc_lengths,
    )

    docs = db.table("documents")
    postings = build_postings(docs, "doc_id", "text").cache()
    lengths = doc_lengths(docs, "doc_id", "text").cache()
    out = {r["doc_id"]: r["score"] for r in bm25_search(
        docs, "doc_id", "text", "fast", postings=postings, lengths=lengths
    ).collect()}
    some_doc, score = next(iter(out.items()))
    n = lengths.count()
    avgdl = lengths.agg(F.avg("dl")).collect()[0][0]
    tf = postings.filter(
        (F.col("term") == "fast") & (F.col("doc_id") == some_doc)
    ).collect()[0]["tf"]
    df_ = postings.filter(F.col("term") == "fast").select("doc_id").distinct().count()
    dl = lengths.filter(F.col("doc_id") == some_doc).collect()[0]["dl"]
    idf = math.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0)
    expect = idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert abs(score - expect) < 1e-9


def test_exact_dedup_roundtrip(db):
    from arcadedb_spark.dedup import dedup_exact

    docs = db.table("documents")
    doubled = docs.unionByName(docs)  # every doc duplicated
    kept = dedup_exact(doubled, "doc_id", "text")
    assert kept.count() == docs.count()


def test_minhash_detects_near_dups(db, spark):
    from arcadedb_spark.dedup import minhash_duplicate_pairs

    base = db.table("documents").limit(20).collect()
    rows = [(r["doc_id"], r["text"]) for r in base]
    # append a near-duplicate of doc 0 (one word changed)
    text0 = rows[0][1]
    rows.append((9999, text0.replace(text0.split()[0], "zzz", 1)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_duplicate_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert any({p["id_a"], p["id_b"]} == {rows[0][0], 9999} for p in pairs)


def test_simhash_hamming_zero_for_identical(db, spark):
    from arcadedb_spark.dedup.simhash import simhash

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox")],
        "id long, text string",
    )
    sigs = [r[0] for r in df.select(simhash("text")).collect()]
    assert sigs[0] == sigs[1]


def test_cosine_identity(db):
    from arcadedb_spark.vector import cosine_similarity

    emb = db.table("embeddings").limit(5)
    r = emb.select(
        cosine_similarity(
            F.col("embedding").cast("array<double>"),
            F.col("embedding").cast("array<double>"),
        ).alias("c")
    ).collect()
    assert all(abs(x["c"] - 1.0) < 1e-9 for x in r)


def test_knn_exact_top1_is_self(db):
    from arcadedb_spark.vector import knn_exact

    emb = db.table("embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    top = knn_exact(emb, "embedding", qv, k=1).collect()[0]
    assert top["vec_id"] == 3


def test_knn_lsh_recall_vs_exact(db):
    from arcadedb_spark.vector import knn_join_exact, knn_lsh

    emb = db.table("embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = knn_join_exact(q, emb, "vec_id", "embedding", "vec_id", "embedding", k=5)
    # random (unclustered) vectors are LSH's worst case: short signatures
    # + many bands buy recall at higher candidate cost
    approx = knn_lsh(q, emb, "vec_id", "embedding", "vec_id", "embedding", k=5,
                     n_planes=4, n_bands=12)
    e = {(r["q_id"], r["d_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["d_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall > 0.6  # ANN quality bar on random vectors


def test_quality_and_tokens(db):
    from arcadedb_spark.text.analysis import quality_score, token_count

    docs = db.table("documents")
    r = docs.select(
        token_count("text").alias("n"), quality_score("text").alias("q")
    ).agg(F.min("n"), F.min("q"), F.max("q")).collect()[0]
    assert r[0] > 0 and 0.0 <= r[1] <= r[2] <= 1.0


def test_timeseries_window_functions(db):
    from arcadedb_spark.timeseries import delta, moving_avg, ts_rank

    ev = db.table("events")
    out = ev.select(
        "event_id",
        delta("value", "user_id", ["ts", "event_id"]).alias("d"),
        moving_avg("value", "user_id", ["ts", "event_id"], 3).alias("ma"),
        ts_rank("user_id", [F.desc("value")]).alias("r"),
    )
    rows = out.collect()
    assert len(rows) == 1000
    assert all(r["r"] >= 1 for r in rows)


def test_continuous_aggregate_batch_equals_stream(db, spark):
    from arcadedb_spark.streaming import ContinuousAggregate

    ev = db.table("events")
    ca = ContinuousAggregate(
        "ca_t", "ts", "1 minute", ["event_type"],
        {"n": F.count(F.lit(1))}, watermark_delay="0 seconds",
    )
    batch = ca.refresh_batch(ev)
    raw_schema = spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    q = ca.start_stream(
        spark, "/root/testdata/sf0.001/*events.parquet", raw_schema, "ca_t_out"
    )
    q.processAllAvailable()
    q.stop()
    stream_rows = spark.sql("SELECT * FROM ca_t_out").count()
    # append mode withholds the final open bucket — stream ≤ batch
    assert 0 < stream_rows <= batch.count()


def test_search_fields_predicate(db):
    from arcadedb_spark.text.fulltext import tokenize
    from pyspark.sql import functions as F

    n = db.query(
        "SELECT count(*) AS n FROM documents WHERE search_fields(['text'], 'stream')"
    ).collect()[0]["n"]
    expect = (
        db.table("documents")
        .filter(F.array_contains(tokenize("text"), "stream"))
        .count()
    )
    assert n == expect


def test_search_index_predicate(db):
    db.command("CREATE INDEX ON documents (text) FULL_TEXT")
    n = db.query(
        "SELECT count(*) AS n FROM documents WHERE search_index('documents[text]', 'stream')"
    ).collect()[0]["n"]
    assert n > 0


def test_mmr_rerank_diversifies(db):
    from arcadedb_spark.vector import cosine_similarity
    from arcadedb_spark.vector.knn import mmr_rerank
    from pyspark.sql import functions as F

    emb = db.table("embeddings")
    qv = [float(x) for x in emb.first()["embedding"]]
    qcol = F.array(*[F.lit(v) for v in qv])
    scored = emb.select(
        "vec_id", "embedding",
        cosine_similarity(F.col("embedding").cast("array<double>"), qcol).alias("score"),
    )
    out = mmr_rerank(scored, "vec_id", "embedding", k=5, lambda_=0.5)
    assert len(out) == 5
    assert out[0][0] == emb.first()["vec_id"]  # most relevant picked first
    assert len({i for i, _ in out}) == 5  # no repeats


def test_random_walks_shape(db):
    from arcadedb_spark.graph.algorithms import random_walks

    e = db.graph().edges("INTERACTED")
    walks = random_walks(e, walk_length=4, walks_per_vertex=3)
    rows = walks.collect()
    n_verts = e.select("src").unionByName(e.select("dst").withColumnRenamed("dst","src")).distinct().count()
    assert len(rows) == n_verts * 3
    assert all(len(r["path"]) == 5 for r in rows)  # start + 4 hops (cyclic graph)


def test_downsampling_tiers(db):
    from arcadedb_spark.timeseries.downsample import DownsamplingTier, downsample
    from pyspark.sql import functions as F

    ev = db.table("events")
    tiers = [
        DownsamplingTier(after_ms=3600_000, granularity_ms=3600_000),   # >1h old → 1h buckets
        DownsamplingTier(after_ms=24 * 3600_000, granularity_ms=86400_000),  # >1d old → 1d
    ]
    out = downsample(
        ev, "ts", tiers,
        {"n": F.count(F.lit(1)), "avg_v": F.round(F.avg("value"), 4)},
        group_by=["event_type"],
        base_granularity_ms=60_000,
    )
    rows = out.collect()
    assert rows
    grans = {r["granularity_ms"] for r in rows}
    assert 86400000 in grans  # old data rolled to daily
    # bucket alignment: bucket_ms divisible by its granularity
    assert all(r["bucket_ms"] % r["granularity_ms"] == 0 for r in rows)
    # row conservation: total event count preserved
    assert sum(r["n"] for r in rows) == ev.count()


def test_search_class_uses_type_index(db):
    db.command("CREATE INDEX ON documents (text) FULL_TEXT")
    n = db.query(
        "SELECT count(*) AS n FROM documents WHERE search_class('stream')"
    ).collect()[0]["n"]
    m = db.query(
        "SELECT count(*) AS n FROM documents WHERE search_fields(['text'], 'stream')"
    ).collect()[0]["n"]
    assert n == m > 0


def test_ngram_prefix_filter_exact(db):
    # AllPairs prefix filtering must be EXACT: identical pairs both ways
    from arcadedb_spark.dedup import ngram_jaccard_pairs

    docs = db.table("documents")
    base = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, prefix_filter=False
        ).collect()
    }
    pref = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, prefix_filter=True
        ).collect()
    }
    assert base == pref
