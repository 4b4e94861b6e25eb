"""Partition-parallelism helpers.

Small dimension tables read from a single parquet file arrive as ONE
partition; any compute-heavy per-row operator (tokenization, hashing,
signature builds) then runs on a single core.  ``ensure_min_partitions``
widens such inputs to the session's default parallelism before the heavy
projection.  On a real cluster reading many files this is a no-op — the
check costs a file listing, not a job.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame


def approx_num_partitions(df: DataFrame) -> int:
    """Cheap scan-partition estimate WITHOUT converting the plan to an
    RDD (``df.rdd.getNumPartitions()`` triggers plan compilation — ~1 s
    on first call per frame).

    For file-backed frames: one partition per maxPartitionBytes slice of
    each input file (Spark's own split rule), summed.  Local paths are
    sized with ``os.path.getsize``; non-local storage (s3://, hdfs://)
    falls back to the exact RDD probe — on a real cluster that probe is
    rare because multi-file inputs short-circuit on file count alone.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        if len(files) >= target:
            return len(files)
        max_bytes = int(
            str(spark.conf.get(
                "spark.sql.files.maxPartitionBytes", "134217728"
            )).rstrip("b")
        )
        total = 0
        for f in files:
            u = urlparse(f)
            if u.scheme not in ("", "file"):
                break  # remote storage: size unknown — exact probe below
            try:
                size = os.path.getsize(u.path or f)
            except OSError:
                break
            total += max(1, -(-size // max_bytes))
        else:
            return total
    return df.rdd.getNumPartitions()


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` partitions if it has fewer.

    Used in front of CPU-bound projections (n-gram/shingle builds, BM25
    postings) where input partitioning, not data volume, limits speed.
    """
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    try:
        current = approx_num_partitions(df)
    except Exception:
        return df.repartition(target)
    if current >= target:
        return df
    return df.repartition(target)
