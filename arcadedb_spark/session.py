"""SparkSession factory tuned for the engine.

Scale posture: these configs are chosen for a real cluster (AQE on, skew
join handling, partition coalescing) and only the master/local bits differ
in tests.  On a 1000-executor cluster the same code runs unchanged; only
``spark.sql.shuffle.partitions`` should be raised (or left to AQE's
coalescing with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults match the driver harness: local[32], 32 shuffle partitions.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "arcadedb-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - UTC session timezone (oracle comparisons are UTC-naive).
    - AQE enabled: runtime join re-planning, skew-join splitting and
      post-shuffle partition coalescing — this is what replaces the
      reference's hand-rolled cost model
      (query/opencypher/optimizer/CypherOptimizer.java:93).
    - Arrow enabled for the few Pandas-UDF code paths.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", _DEFAULT_CPUS)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark 4 captures a Python call site (stack walk + py4j round
        # trip) on EVERY DataFrame API call for error enrichment; the
        # engine builds plans with thousands of calls per query, so this
        # is pure driver-side latency — disable it (errors still carry
        # the JVM-side origin).
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # TIMESTAMP(NANOS) parquet (reference type DATETIME_NANOS,
        # schema/Type.java:96) is read as long and converted to micros by
        # the catalog loader — Spark has no nanos timestamp type.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Runtime Bloom-filter injection (guide §3.2) fires only on
        # shuffle joins whose application-side scan exceeds
        # applicationSideScanSizeThreshold (10 GB default — never at
        # bench SF, always on a 100-TB fact scan), but the default
        # creationSideThreshold of 10 MB is cluster-hostile: a
        # selectively-filtered build side of a multi-hop MATCH is
        # routinely hundreds of MB at scale and the bloom build (one
        # extra aggregate over it) is still ~free next to the fact-side
        # shuffle it prunes.  Raise it; both knobs stay env-overridable.
        .config(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            os.environ.get("SPARK_GRAFT_BLOOM_CREATION_MAX", "512MB"),
        )
        .config(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            os.environ.get("SPARK_GRAFT_BLOOM_APP_MIN", "10GB"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{_DEFAULT_CPUS}]")
    return builder.getOrCreate()
