"""n-gram Jaccard similarity pairs.

Candidate generation by shared-n-gram inverted index (equi-join on the
n-gram hash), then exact Jaccard verification on the candidate pairs —
never all-pairs.  Frequent n-grams are capped (``max_df``) so stop-shingle
buckets don't explode the join (the classic skew guard at corpus scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcadedb_spark.text.fulltext import tokenize


def _ngram_set(text_col, n: int) -> F.Column:
    toks = tokenize(text_col)
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(F.transform(grams, lambda g: F.xxhash64(g)))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 1000,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard ≥ threshold) on n-gram sets."""
    sets = docs.select(
        F.col(id_col).alias("id"), _ngram_set(text_col, n).alias("grams")
    ).cache()
    inv = sets.select("id", F.explode("grams").alias("g"))
    # skew guard: drop n-grams present in too many docs
    rare = inv.groupBy("g").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
    inv = inv.join(rare.select("g"), "g", "left_semi")
    l, r = inv.alias("l"), inv.alias("r")
    cand = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return (
        cand.join(sets.select(F.col("id").alias("id_a"), F.col("grams").alias("__ga")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("grams").alias("__gb")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("__ga", "__gb")))
        .withColumn("uni", F.size(F.array_union("__ga", "__gb")))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
