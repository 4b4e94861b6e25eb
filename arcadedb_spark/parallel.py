"""Partition-parallelism helpers.

Small dimension tables read from a single parquet file arrive as ONE
partition; any compute-heavy per-row operator (tokenization, hashing,
signature builds) then runs on a single core.  ``ensure_min_partitions``
widens such inputs to the session's default parallelism before the heavy
projection.  On a real cluster reading many files this is a no-op — the
check costs one plan inspection, not a job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` partitions if it has fewer.

    Used in front of CPU-bound projections (n-gram/shingle builds, BM25
    postings) where input partitioning, not data volume, limits speed.
    """
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df.repartition(target)
    if current >= target:
        return df
    return df.repartition(target)
