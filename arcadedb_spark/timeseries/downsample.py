"""Time-series downsampling tiers + retention.

Reference: engine/timeseries/DownsamplingTier.java (record: afterMs,
granularityMs) + TimeSeriesMaintenanceScheduler.java — old data is rolled
up to coarser granularity; data older than the retention window drops.

Spark expression: a batch compaction job producing one tiered frame —
each row lands in the granularity of the newest tier whose ``after``
horizon it has passed (raw rows keep their bucket at the base
granularity).  At scale this runs as a periodic job that overwrites the
tiered table partition-by-partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arcadedb_spark.timeseries.functions import time_bucket


class DownsamplingTier:
    """after_ms: age threshold; granularity_ms: bucket width past it."""

    def __init__(self, after_ms: int, granularity_ms: int) -> None:
        self.after_ms = after_ms
        self.granularity_ms = granularity_ms


def downsample(
    df: DataFrame,
    ts_col: str,
    tiers: list[DownsamplingTier],
    aggs: dict[str, Column],
    group_by: list[str] = (),
    base_granularity_ms: int = 60_000,
    now_ms: int | None = None,
    retention_ms: int | None = None,
) -> DataFrame:
    """Roll rows into age-appropriate buckets.

    Returns (bucket_ms, granularity_ms, *group_by, *aggs) — one row per
    (bucket, keys) at the granularity its age dictates.  ``now_ms``
    defaults to the max timestamp in the frame (deterministic for tests).
    """
    if now_ms is None:
        now_ms = df.agg(F.max(F.unix_millis(F.col(ts_col)))).collect()[0][0]
    age = F.lit(now_ms) - F.unix_millis(F.col(ts_col))

    if retention_ms is not None:
        df = df.filter(age <= retention_ms)

    # granularity = base, overridden by each tier (sorted oldest horizon
    # last so the coarsest matching tier wins)
    gran = F.lit(base_granularity_ms)
    for tier in sorted(tiers, key=lambda t: t.after_ms):
        gran = F.when(age > tier.after_ms, F.lit(tier.granularity_ms)).otherwise(gran)

    epoch_ms = F.unix_millis(F.col(ts_col))
    bucket = (epoch_ms / gran).cast("long") * gran
    out = df.withColumn("__bucket_ms", bucket).withColumn("__gran", gran)
    return (
        out.groupBy(
            F.col("__bucket_ms").alias("bucket_ms"),
            F.col("__gran").alias("granularity_ms"),
            *group_by,
        )
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
