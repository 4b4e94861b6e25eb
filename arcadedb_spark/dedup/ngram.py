"""n-gram Jaccard similarity pairs.

Candidate generation by shared-n-gram inverted index (equi-join on the
n-gram hash), with similarity computed over the *rare* n-gram sets:
grams with document frequency > ``max_df`` (stop-shingles) are excluded
from both candidate generation and the Jaccard itself — the standard
corpus-scale skew guard (a gram shared by half the corpus carries no
similarity signal but would explode the self-join).

Execution shape (100 TB-ready):
- gram build is one projection over the documents (tokens via
  ``arrays_zip`` of shifted slices, so no outer expression is referenced
  inside a higher-order-function lambda — Catalyst re-evaluates such
  references per element, measured 9× slower for the regex tokenizer);
- ONE cached exploded inverted index; document-frequency and set-size
  side tables are broadcast;
- intersection sizes come from ``groupBy(pair).count()`` on the
  inverted-index self-join — no wide gram arrays ever shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arcadedb_spark.parallel import ensure_min_partitions
from arcadedb_spark.text.fulltext import tokenize


def ngram_hashes(text_col, n: int) -> Column:
    """Hashed distinct n-gram set of a text column (array<long>).

    Shingles are built by zipping ``n`` shifted slices of the token array
    so the per-element lambda touches only its own struct element; docs
    shorter than ``n`` tokens yield their whole token sequence as one
    gram, and empty docs hash the empty string (both matching a
    ``sequence``+``slice`` formulation and the DuckDB oracle).
    """
    t = tokenize(text_col)
    length = F.size(t)
    slices = [
        F.slice(t, k + 1, F.greatest(length - (n - 1), F.lit(1))) for k in range(n)
    ]
    grams = F.transform(
        F.arrays_zip(*slices),
        lambda s: F.xxhash64(F.concat_ws(" ", *[s[f"{k}"] for k in range(n)])),
    )
    return F.when(length == 0, F.array(F.xxhash64(F.lit("")))).otherwise(
        F.array_distinct(grams)
    )


def ngram_sets(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, grams: array<long>) per document."""
    return docs.select(
        F.col(id_col).alias("id"), ngram_hashes(F.col(text_col), n).alias("grams")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 1000,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard ≥ threshold) on rare-n-gram sets."""
    src = ensure_min_partitions(docs.select(id_col, text_col))
    sets = ngram_sets(src, id_col, text_col, n)
    inv = sets.select("id", F.explode("grams").alias("g")).cache()
    # skew guard: stop-shingles (df > max_df) leave the similarity space
    rare = F.broadcast(
        inv.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("g")
    )
    inv2 = inv.join(rare, "g")
    sizes = F.broadcast(inv2.groupBy("id").agg(F.count("*").alias("sz")))
    l, r = inv2.alias("l"), inv2.alias("r")
    inter = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "__sa"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "__sb"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("__sa") + F.col("__sb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
