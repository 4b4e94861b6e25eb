"""Continuous aggregates on Structured Streaming.

Reference semantics (schema/ContinuousAggregateImpl.java:34-61,
ContinuousAggregateRefresher.java:45-102): a source type + aggregate
query + fixed tumbling bucket (``bucketIntervalMs``) + watermark; refresh
re-aggregates only buckets at/after the watermark, advances the watermark
to the last complete bucket boundary, and rows arriving behind the
watermark are never re-aggregated (late data dropped).

Structured Streaming's ``withWatermark + window + append`` has the same
contract: a window emits once the watermark passes its end, after which
late rows for it are dropped.  ``refresh_batch`` provides the equivalent
batch computation for oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ContinuousAggregate:
    """CREATE CONTINUOUS AGGREGATE analog.

    aggs: dict output_name → Column aggregate over the source.
    """

    def __init__(
        self,
        name: str,
        ts_col: str,
        bucket_interval: str,  # e.g. '1 minute'
        group_by: list[str],
        aggs: dict[str, Column],
        watermark_delay: str = "0 seconds",
    ) -> None:
        self.name = name
        self.ts_col = ts_col
        self.bucket_interval = bucket_interval
        self.group_by = group_by
        self.aggs = aggs

        self.watermark_delay = watermark_delay

    def _agg(self, df: DataFrame) -> DataFrame:
        win = F.window(self.ts_col, self.bucket_interval)
        out = df.groupBy(win.alias("__w"), *self.group_by).agg(
            *[c.alias(n) for n, c in self.aggs.items()]
        )
        return out.select(
            F.col("__w.start").alias("bucket"), *self.group_by, *self.aggs.keys()
        )

    def refresh_batch(self, source: DataFrame) -> DataFrame:
        """Batch refresh — equivalent result to a fully-caught-up stream."""
        return self._agg(source)

    def start_stream(
        self,
        spark,
        source_path: str,
        schema,
        query_name: str | None = None,
        trigger_once: bool = True,
    ):
        """Streaming refresh over a parquet directory source.

        ``source_path`` must be a directory or glob (Spark's file stream
        source rejects a bare file path — pass ``dir/*name.parquet``).
        Returns the StreamingQuery; results land in the in-memory table
        ``query_name`` (default: the aggregate's name).  In append mode
        the last incomplete bucket is withheld until the watermark passes
        it — the reference's "advance to last complete bucket boundary"
        (ContinuousAggregateRefresher.java:45-102).
        """
        stream = (
            spark.readStream.format("parquet").schema(schema).load(source_path)
        )
        # TIMESTAMP(NANOS) parquet surfaces as TIMESTAMP_NTZ (pyspark 4.x)
        # or long nanos (legacy nanosAsLong) — normalize either to
        # TIMESTAMP so the watermark is a real event time.
        ts_dtype = dict(stream.dtypes).get(self.ts_col)
        if ts_dtype == "bigint":
            stream = stream.withColumn(
                self.ts_col,
                F.timestamp_micros((F.col(self.ts_col) / 1000).cast("long")),
            )
        elif ts_dtype == "timestamp_ntz":
            stream = stream.withColumn(
                self.ts_col, F.col(self.ts_col).cast("timestamp")
            )
        agged = self._agg(stream.withWatermark(self.ts_col, self.watermark_delay))
        q = (
            agged.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name or self.name)
        )
        return q.start()
