"""Streaming analytics: watermarked windowed rollup + stateful
sessionization (applyInPandasWithState)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lighthouse_spark.streaming import windowed as W

BASE = pd.Timestamp("2024-01-01").value // 10**9  # epoch seconds

EVENTS_SCHEMA = "user_id long, ts timestamp, event_type string, value double"


def _ev(user, offset_s, etype="click", value=1.0):
    # createDataFrame wants datetime.datetime, not pandas.Timestamp
    return (user, pd.Timestamp(BASE + offset_s, unit="s").to_pydatetime(), etype, value)


def _drop_dir_stream(spark, tmp_path, batches, name):
    import time

    d = tmp_path / name
    d.mkdir()
    for i, rows in enumerate(batches):
        if i:
            time.sleep(1.05)  # file-source orders by modification time
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"b{i}"))
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "b*"))
    )


def test_windowed_rollup_streaming_equals_batch(spark, tmp_path):
    """In-order stream through the watermarked rollup == the batch
    rollup of the same rows (nothing late => nothing dropped)."""
    rows = [
        _ev(1, day * 86400 + k * 600, etype, float(k))
        for day in range(3)
        for k, etype in enumerate(["click", "click", "purchase"])
    ]
    rows.sort(key=lambda r: r[1])
    batches = [rows[:3], rows[3:6], rows[6:]]
    stream = _drop_dir_stream(spark, tmp_path, batches, "wr")
    acc = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            acc[(r["window_start"], r["event_type"])] = (r["n"], r["sum_value"])

    q = (
        W.windowed_event_rollup(stream, window="1 day", watermark="2 days")
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in W.windowed_event_rollup(
            spark.createDataFrame(rows, EVENTS_SCHEMA), window="1 day"
        ).collect()
    }
    assert acc == batch and len(batch) == 6


def test_watermark_drops_too_late_events(spark, tmp_path):
    """An event older than (max seen - watermark) is DROPPED; one
    inside the watermark still lands in its window."""
    b1 = [_ev(1, 10 * 86400 + k) for k in range(3)]           # day 10
    b2 = [_ev(1, 10 * 86400 + 5)]                              # advances the watermark
    b3 = [_ev(1, 1 * 86400), _ev(1, 9 * 86400)]               # day 1 (too late), day 9 (ok)
    # NB: this engine version applies a batch's event-time stats to the
    # watermark one batch later, hence the intervening b2
    stream = _drop_dir_stream(spark, tmp_path, [b1, b2, b3], "late")
    acc = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            acc[r["window_start"]] = (r["n"], r["sum_value"])

    q = (
        W.windowed_event_rollup(stream, window="1 day", watermark="2 days")
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    days = {int((ts.timestamp() - BASE) // 86400) for ts in acc}
    assert 10 in days and 9 in days
    assert 1 not in days, "event beyond the watermark was not dropped"


def test_sessionize_stateful(spark, tmp_path):
    """Gap-based sessions via applyInPandasWithState: emitted (closed)
    sessions match the pure-Python oracle; the trailing session per
    user stays open in state."""
    gap = 1800
    raw = [
        (1, 0.0, 2.0), (1, 100.0, 3.0),          # session A (closed by the jump)
        (1, 5000.0, 1.0), (1, 5100.0, 1.0),       # session B (still open)
        (2, 0.0, 10.0), (2, 50.0, 10.0),          # session C (still open)
        (2, 9000.0, 5.0),                          # no wait — closes C
    ]
    rows = [_ev(u, t, "click", v) for u, t, v in raw]
    batches = [rows[:2] + rows[4:6], rows[2:4] + rows[6:]]
    stream = _drop_dir_stream(spark, tmp_path, batches, "sess")
    emitted = []

    def sink(bdf, bid):
        for r in bdf.collect():
            emitted.append(
                (
                    r["user_id"],
                    float(r["session_start"].timestamp() - BASE),
                    float(r["session_end"].timestamp() - BASE),
                    r["n_events"],
                    r["sum_value"],
                )
            )

    q = (
        W.sessionize(stream, gap_seconds=gap)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    all_sessions = W.sessionize_batch_oracle(raw, gap_seconds=gap)
    last_per_user = {}
    for s in all_sessions:
        last_per_user[s[0]] = s  # sorted -> last wins
    closed = sorted(s for s in all_sessions if s != last_per_user[s[0]])
    assert sorted(emitted) == closed
    # sanity on the oracle itself: user 1 closed A, user 2 closed C
    assert closed == [(1, 0.0, 100.0, 2, 5.0), (2, 0.0, 50.0, 2, 20.0)]


def test_dedup_stream_within_watermark(spark, tmp_path):
    """At-least-once redelivery: duplicate (user_id, ts) events across
    micro-batches must emit exactly once; streaming output == the batch
    twin's dropDuplicates over the same rows."""
    e1 = _ev(1, 0, "click", 1.0)
    e2 = _ev(2, 600, "click", 2.0)
    e3 = _ev(1, 1200, "purchase", 3.0)
    batches = [
        [e1, e2],
        [e1, e3],        # e1 redelivered in a later micro-batch
        [e2, e3, e3],    # more redeliveries, incl. within-batch
    ]
    stream = _drop_dir_stream(spark, tmp_path, batches, "dd")
    got = []

    def sink(bdf, bid):
        got.extend(
            (r["user_id"], r["ts"], r["event_type"], r["value"]) for r in bdf.collect()
        )

    q = (
        W.dedup_stream(stream, ["user_id", "ts"], watermark="1 hour")
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    flat = [r for b in batches for r in b]
    want = sorted(
        (r["user_id"], r["ts"], r["event_type"], r["value"])
        for r in W.dedup_stream(
            spark.createDataFrame(flat, EVENTS_SCHEMA), ["user_id", "ts"]
        ).collect()
    )
    assert sorted(got) == want
    assert len(got) == 3  # e1, e2, e3 exactly once each
