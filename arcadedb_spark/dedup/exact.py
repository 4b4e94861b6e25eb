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
    """Docs with duplicates removed (minimum id survives per group)."""
    fp = docs.withColumn("__fp", exact_fingerprint(text_col))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return docs.join(keep, id_col, "left_semi")
