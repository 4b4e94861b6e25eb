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

# compressed input bytes that justify one more core of widening.
# Measured (r8): the regex-tokenize + 3-gram xxhash projection sustains
# ~0.5 MB/s/core of compressed parquet text (584 KB corpus: 0.63 s on 5
# cores vs 0.34 s on 16), so a 32 KB/core grain keeps per-task compute
# well above the ~5 ms scheduling overhead while letting small corpora
# actually use the machine.
_BYTES_PER_CORE = 32 * 1024


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


def _input_file_info(df: DataFrame) -> "tuple[list[str], list[int] | None]":
    """(input files, their sizes) — sizes is None when any file is not
    locally stat-able (remote object storage)."""
    try:
        files = df.inputFiles()
    except Exception:
        return [], None
    sizes: "list[int] | None" = []
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return files, None
        try:
            sizes.append(os.path.getsize(u.path or f))
        except OSError:
            return files, None
    return files, sizes


def _estimate_partitions(spark, sizes: "list[int]") -> int:
    """Mirror Spark's file-split rule (FilePartition.maxSplitBytes):
    maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    totalBytes/defaultParallelism)); files are bin-packed into splits of
    ≤ maxSplitBytes counting openCost per file."""
    target = spark.sparkContext.defaultParallelism
    max_bytes = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    open_cost = _parse_bytes(
        spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    )
    total = sum(sizes) + open_cost * len(sizes)
    max_split = min(max_bytes, max(open_cost, total // max(1, target)))
    return max(1, -(-total // max(1, max_split)))


def approx_num_partitions(df: DataFrame) -> int:
    """Cheap scan-partition estimate WITHOUT converting the plan to an
    RDD (``df.rdd.getNumPartitions()`` triggers plan compilation — ~1 s
    on first call per frame).

    Local files are sized and bin-packed like Spark itself would; on
    non-stat-able storage (s3://, hdfs://) a multi-file input
    short-circuits on file count alone (close enough for the ≥-target
    comparisons this feeds), and only single-file remote inputs pay the
    exact RDD probe.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    files, sizes = _input_file_info(df)
    if sizes is not None and files:
        return _estimate_partitions(spark, sizes)
    if len(files) >= target:
        return len(files)
    return df.rdd.getNumPartitions()


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
    files, sizes = _input_file_info(df)
    try:
        if sizes is not None and files:
            # one listing serves both the size bound and the current-
            # partition estimate (no second stat pass)
            target = min(target, max(1, -(-sum(sizes) // bytes_per_core)))
            current = _estimate_partitions(spark, sizes)
        elif len(files) >= target:
            current = len(files)
        else:
            current = df.rdd.getNumPartitions()
    except Exception:
        return df.repartition(target)
    if current >= target:
        return df
    return df.repartition(target)
