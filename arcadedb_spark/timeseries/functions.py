"""ts.* functions as Window-spec Column builders.

Reference semantics (function/sql/time/*.java):
- ts.timeBucket(ts, ms)  — truncate to fixed epoch-ms buckets
  (SQLFunctionTimeBucket.java:40)
- ts.lag/ts.lead         — previous/next value within the group ordered
  by timestamp (SQLFunctionLag.java:39)
- ts.rank                — rank with gaps (SQLFunctionRank.java:31-33)
- ts.movingAvg(v, n)     — trailing n-row mean (SQLFunctionMovingAvg.java)
- ts.delta / ts.rate     — difference vs previous sample; per-second rate
  (SQLFunctionDelta.java, SQLFunctionRate.java)

Scale: all of these are single-pass Window computations — one shuffle on
the partition keys, sorted within partitions; no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def _win(partition_by, order_by) -> WindowSpec:
    pb = partition_by if isinstance(partition_by, (list, tuple)) else [partition_by]
    ob = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    return Window.partitionBy(*pb).orderBy(*ob)


def time_bucket(ts: Column | str, interval_ms: int) -> Column:
    """Bucket-start timestamp for fixed epoch-aligned buckets."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    epoch_ms = F.unix_millis(ts)
    return F.timestamp_millis((epoch_ms / interval_ms).cast("long") * interval_ms)


def ts_lag(value, partition_by, order_by, offset: int = 1) -> Column:
    return F.lag(value, offset).over(_win(partition_by, order_by))


def ts_lead(value, partition_by, order_by, offset: int = 1) -> Column:
    return F.lead(value, offset).over(_win(partition_by, order_by))


def ts_rank(partition_by, order_by) -> Column:
    """Rank with gaps (reference ties-get-equal-rank, next rank skips)."""
    return F.rank().over(_win(partition_by, order_by))


def ts_row_number(partition_by, order_by) -> Column:
    return F.row_number().over(_win(partition_by, order_by))


def moving_avg(value, partition_by, order_by, window_size: int) -> Column:
    """Trailing window mean over the last ``window_size`` rows (inclusive)."""
    w = _win(partition_by, order_by).rowsBetween(-(window_size - 1), 0)
    return F.avg(value).over(w)


def delta(value, partition_by, order_by) -> Column:
    """value − previous value (null for the first sample in the group)."""
    value = F.col(value) if isinstance(value, str) else value
    return value - F.lag(value, 1).over(_win(partition_by, order_by))


def rate(value, ts, partition_by, order_by=None) -> Column:
    """Per-second rate of change vs the previous sample."""
    value = F.col(value) if isinstance(value, str) else value
    ts = F.col(ts) if isinstance(ts, str) else ts
    w = _win(partition_by, order_by if order_by is not None else ts)
    dv = value - F.lag(value, 1).over(w)
    dt = (F.unix_millis(ts) - F.unix_millis(F.lag(ts, 1).over(w))) / 1000.0
    return F.when(dt > 0, dv / dt)


def interpolate_linear(df, value_col: str, ts_col: str, partition_by) -> "Column":
    """Linear interpolation of null samples between neighbors
    (SQLFunctionTsInterpolate parity).  Returns a Column to select.

    Uses last/first ignoring nulls over unbounded frames — one window pass
    each direction.
    """
    pb = partition_by if isinstance(partition_by, (list, tuple)) else [partition_by]
    w_prev = Window.partitionBy(*pb).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_next = Window.partitionBy(*pb).orderBy(ts_col).rowsBetween(
        0, Window.unboundedFollowing
    )
    v = F.col(value_col)
    t = F.unix_millis(F.col(ts_col))
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    next_v = F.first(v, ignorenulls=True).over(w_next)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(w_prev)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(w_next)
    frac = F.when(
        next_t != prev_t, (t - prev_t) / (next_t - prev_t)
    ).otherwise(F.lit(0.0))
    return F.when(v.isNotNull(), v).otherwise(prev_v + (next_v - prev_v) * frac)


def sessionize(
    df, ts_col: str, partition_by, gap_ms: int, session_col: str = "session_id"
):
    """Assign session ids: a new session starts when the gap to the
    previous event exceeds ``gap_ms`` (classic lag+cumsum sessionization;
    the streaming analog is ``session_window`` — SURVEY §2.12 notes the
    reference has no session windows, this is a beyond-reference op).

    Returns df + (session_col: per-partition session ordinal starting 1).
    """
    pb = partition_by if isinstance(partition_by, (list, tuple)) else [partition_by]
    w = Window.partitionBy(*pb).orderBy(ts_col)
    prev = F.lag(F.unix_millis(F.col(ts_col))).over(w)
    new_session = F.when(
        prev.isNull() | (F.unix_millis(F.col(ts_col)) - prev > gap_ms), 1
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
