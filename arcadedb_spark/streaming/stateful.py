"""Custom stateful streaming operators (applyInPandasWithState).

The reference's incremental features are tumbling-bucket continuous
aggregates (ContinuousAggregateImpl.java) — Structured Streaming covers
those declaratively (streaming/continuous_aggregate.py).  This module is
the escape hatch for operators those buckets can't express: arbitrary
per-key state machines, here a streaming SESSIONIZER (the stream analog
of timeseries sessionize / SURVEY §2.12 session-window note).

Semantics: per user, events within ``gap`` of the previous event extend
the current session; a longer silence closes it.  Closed sessions are
EMITTED when the event-time watermark passes session_end + gap (the
GroupStateTimeout.EventTimeTimeout contract), so late events inside the
watermark still extend their session — the same drop-late rule as the
continuous aggregate.

Scale shape: state is per-key (user), partitioned by the stream's
groupBy hash — 1000 executors hold 1/1000th of the keys each; the
pandas callback sees one key's events per micro-batch as an Arrow
batch, never a row at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"

_UNIT_MS = {
    "millisecond": 1, "second": 1000, "minute": 60_000, "hour": 3_600_000,
    "day": 86_400_000, "week": 604_800_000,
}


def _interval_ms(spec: str) -> int:
    """'30 minutes' / '1 hour' / '90 seconds' → millis."""
    n, unit = spec.strip().split()
    return int(float(n)) * _UNIT_MS[unit.rstrip("s").lower()]


def _sessionize_fn(gap_ms: int):
    """State machine: (key, batches, state) → closed-session rows."""

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(last, unit="ms")],
                    "n_events": [n],
                }
            )
            return

        ts_all = []
        for pdf in pdfs:
            ts_all.extend(int(t.value // 1_000_000) for t in pdf["ts"])
        ts_all.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed = []
        for t in ts_all:
            if start is None:
                start, last, n = t, t, 1
            elif t - last <= gap_ms:
                last, n = max(last, t), n + 1
            else:
                closed.append((start, last, n))
                start, last, n = t, t, 1
        state.update((start, last, n))
        # wake up when the watermark passes the session close boundary
        state.setTimeoutTimestamp(last + gap_ms)
        if closed:
            import pandas as pd

            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming DataFrame of closed sessions
    (user_id, session_start, session_end, n_events)."""
    gap_ms = _interval_ms(gap)
    src = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark_delay)
    return src.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_ms),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
