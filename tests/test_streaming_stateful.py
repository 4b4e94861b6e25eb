"""applyInPandasWithState streaming sessionizer test (SURVEY §2.12 —
custom stateful operator beyond tumbling continuous aggregates)."""

from __future__ import annotations

import json
import time


def _write_batch(d, name, rows):
    p = d / name
    p.write_text("\n".join(json.dumps(r) for r in rows))


def test_streaming_sessionize(spark, tmp_path):
    from arcadedb_spark.streaming.stateful import streaming_sessionize

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    base = 1_700_000_000_000  # ms epoch

    # user 1: two events 10s apart (one session), then 10-minute silence,
    # then one more event (second session); user 2: single event
    _write_batch(src_dir, "b1.json", [
        {"user_id": 1, "ts_ms": base},
        {"user_id": 1, "ts_ms": base + 10_000},
        {"user_id": 2, "ts_ms": base + 5_000},
    ])

    stream = (
        spark.readStream.schema("user_id long, ts_ms long")
        .json(str(src_dir))
        .selectExpr("user_id", "timestamp_millis(ts_ms) AS ts")
    )
    sessions = streaming_sessionize(stream, gap="1 minute")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: an event far in the future advances the watermark
        # past every open session's close boundary → timeouts fire
        _write_batch(src_dir, "b2.json", [
            {"user_id": 1, "ts_ms": base + 600_000},
            {"user_id": 3, "ts_ms": base + 7_200_000},
        ])
        q.processAllAvailable()
        _write_batch(src_dir, "b3.json", [
            {"user_id": 3, "ts_ms": base + 10_800_000},
        ])
        q.processAllAvailable()
        rows = {
            (r["user_id"], r["n_events"])
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
    finally:
        q.stop()
    # user 1's first session (2 events) and user 2's (1 event) must have
    # closed; user 1's second session closes too once the watermark moves
    assert (1, 2) in rows
    assert (2, 1) in rows
    assert (1, 1) in rows


def test_sessionize_state_machine_pure():
    """The state transition logic, driven directly (no stream)."""
    from arcadedb_spark.streaming.stateful import _interval_ms

    assert _interval_ms("30 minutes") == 1_800_000
    assert _interval_ms("90 seconds") == 90_000
    assert _interval_ms("1 hour") == 3_600_000
