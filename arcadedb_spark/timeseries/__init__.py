"""Time-series analytics: ts.* function surface on Window specs.

Reference: engine/src/main/java/com/arcadedb/engine/timeseries/ (columnar
TS engine) and function/sql/time/SQLFunction{TimeBucket,Lag,Lead,Rank,
RowNumber,MovingAvg,Delta,Rate,…}.java — windowed analytics applied over
groups ordered by a timestamp.  On Spark these are Window functions;
parquet already gives the columnar layout + encodings the reference's TS
shards implement by hand (SURVEY.md §1.1).
"""

from arcadedb_spark.timeseries.functions import (
    delta,
    moving_avg,
    rate,
    time_bucket,
    ts_lag,
    ts_lead,
    ts_rank,
    ts_row_number,
)

__all__ = [
    "time_bucket", "ts_lag", "ts_lead", "ts_rank", "ts_row_number",
    "moving_avg", "delta", "rate",
]
