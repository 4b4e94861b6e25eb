"""Streaming / incremental features.

Reference: continuous aggregates (schema/ContinuousAggregateImpl.java:34-61
— tumbling ``bucketIntervalMs`` buckets + watermark; late rows dropped,
ContinuousAggregateRefresher.java:45-102) and materialized views
(schema/MaterializedViewRefreshMode.java:21-25).  The Spark re-expression
is Structured Streaming: ``groupBy(window(ts, interval))`` +
``withWatermark`` in append mode — identical drop-late semantics
(SURVEY.md §2.12).
"""

from arcadedb_spark.streaming.continuous_aggregate import ContinuousAggregate

__all__ = ["ContinuousAggregate"]
