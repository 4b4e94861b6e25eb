"""Inverted index + BM25 scoring as DataFrame programs.

Scoring parity target: index/fulltext/BM25Scorer.java —
    idf(N, df)    = ln((N − df + 0.5)/(df + 0.5) + 1)       (Lucene variant)
    term(idf, tf) = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
with k1 = 1.2, b = 0.75 (DEFAULT_K1/DEFAULT_B, BM25Scorer.java:43,49).
Analyzer parity: lowercase, split on non-word chars (the reference's
default analyzer in LSMTreeFullTextIndex).

Scale: postings are (term, doc_id, tf) — groupBy term for df, broadcast
the (tiny) query-term stats, one shuffle for the score aggregation.  At
100 TB the postings build is a flatMap + two map-side-combinable
aggregations; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75

_TOKEN_SPLIT = r"[^\p{L}\p{N}]+"


def tokenize(col) -> F.Column:
    """Lowercase \\W+ tokenizer (reference default analyzer)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(col), _TOKEN_SPLIT), lambda t: F.length(t) > 0
    )


def build_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, doc_id, tf) postings — the inverted-index DataFrame."""
    from arcadedb_spark.parallel import ensure_min_partitions

    src = ensure_min_partitions(docs.select(id_col, text_col))
    return (
        src.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("__toks"))
        .select("doc_id", F.explode("__toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def doc_lengths(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), F.size(tokenize(text_col)).alias("dl")
    )


def bm25_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    postings: DataFrame | None = None,
    lengths: DataFrame | None = None,
) -> DataFrame:
    """Score every document containing ≥1 query term; returns
    (doc_id, score) — the DataFrame analog of
    ``SELECT FROM doc WHERE search_index('idx', query)`` with BM25
    ordering (function/sql/text/SQLFunctionSearchIndex.java).
    """
    if postings is None:
        # one tokenize scan: lengths and stats derive from the postings
        # (dl = Σ tf per doc; docs with zero tokens contribute dl 0 to the
        # average, matching doc_lengths over the full corpus)
        postings = build_postings(docs, id_col, text_col).cache()
    if lengths is None:
        lengths = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    n_docs = docs.count()
    total_tokens = postings.agg(F.sum("tf")).collect()[0][0] or 0
    avgdl = total_tokens / n_docs if n_docs else 1.0

    terms = [t for t in set(query.lower().split()) if t]
    qterms = postings.sparkSession.createDataFrame(
        [(t,) for t in terms], "term string"
    )
    hits = postings.join(F.broadcast(qterms), "term")
    df_counts = hits.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_counts.withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
    )
    scored = (
        hits.join(F.broadcast(idf.select("term", "idf")), "term")
        .join(lengths, "doc_id")
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    return scored
