"""Partition-parallelism helpers.

Small dimension tables read from a single parquet file arrive as ONE
partition; any compute-heavy per-row operator (tokenization, hashing,
signature builds) then runs on a single core.  ``ensure_min_partitions``
widens such inputs before the heavy projection — but SIZE-AWARE: a
kilobyte-scale input widened to 32 partitions pays 32 tasks of scheduler
overhead per downstream stage for no CPU win, so the width is bounded by
``ceil(input_bytes / bytes_per_core)``.  On a real cluster reading many
large files the helper is a no-op — the check costs a file listing, not
a job.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame

# compressed input bytes that justify one more core of widening; regex
# tokenization / xxhash shingling chew ~1 MB of parquet text in well
# under a second, so finer slicing is pure scheduler overhead
_BYTES_PER_CORE = 128 * 1024


def _parse_bytes(v) -> int:
    """Parse Spark size strings: plain ints, or k/m/g(b) suffixes."""
    s = str(v).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    if s and s[-1] in "kmgt":
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}[s[-1]]
        s = s[:-1]
    return int(float(s)) * mult


def _local_file_sizes(df: DataFrame) -> "list[int] | None":
    """Sizes of the frame's input files, or None when not file-backed /
    not locally stat-able (remote object storage)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    sizes = []
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return None
        try:
            sizes.append(os.path.getsize(u.path or f))
        except OSError:
            return None
    return sizes


def approx_num_partitions(df: DataFrame) -> int:
    """Cheap scan-partition estimate WITHOUT converting the plan to an
    RDD (``df.rdd.getNumPartitions()`` triggers plan compilation — ~1 s
    on first call per frame).

    Mirrors Spark's own file-split rule (FilePartition.maxSplitBytes):
    maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    totalBytes/defaultParallelism)); files are then bin-packed into
    splits of ≤ maxSplitBytes counting openCost per file.  Non-local
    storage falls back to the exact RDD probe — rare on a real cluster
    because multi-file inputs short-circuit on file count alone.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    sizes = _local_file_sizes(df)
    if sizes is None:
        return df.rdd.getNumPartitions()
    max_bytes = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    open_cost = _parse_bytes(
        spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    )
    total = sum(sizes) + open_cost * len(sizes)
    max_split = min(max_bytes, max(open_cost, total // max(1, target)))
    return max(1, -(-total // max(1, max_split)))


def ensure_min_partitions(
    df: DataFrame,
    target: int | None = None,
    bytes_per_core: int = _BYTES_PER_CORE,
) -> DataFrame:
    """Repartition ``df`` up to ``target`` partitions if it has fewer —
    bounded by the input's size (one extra partition per
    ``bytes_per_core`` of compressed input), so tiny corpora don't fan
    out into overhead-dominated micro-tasks.

    Used in front of CPU-bound projections (n-gram/shingle builds, BM25
    postings) where input partitioning, not data volume, limits speed.
    """
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    sizes = _local_file_sizes(df)
    if sizes is not None:
        by_size = max(1, -(-sum(sizes) // bytes_per_core))
        target = min(target, by_size)
    try:
        current = approx_num_partitions(df)
    except Exception:
        return df.repartition(target)
    if current >= target:
        return df
    return df.repartition(target)
