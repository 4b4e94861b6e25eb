"""Exact deduplication by normalized-content hash.

Hash-groupBy: one map-side-combinable aggregation; the canonical survivor
is the minimum id (deterministic).  Scales linearly — the md5 is computed
in codegen during the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcadedb_spark.text.analysis import exact_fingerprint


def exact_duplicates(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups with >1 member: (fingerprint, n_dups, keep_id, dup_ids)."""
    fp = docs.select(
        F.col(id_col).alias("id"), exact_fingerprint(text_col).alias("fp")
    )
    return (
        fp.groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("id").alias("keep_id"),
            F.sort_array(F.collect_list("id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Docs with duplicates removed — exactly one survivor (minimum id)
    per content fingerprint, even when duplicate rows share an id."""
    from pyspark.sql import Window

    w = Window.partitionBy("__fp").orderBy(id_col)
    return (
        docs.withColumn("__fp", exact_fingerprint(text_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )
