"""Streaming analytics over the events stream: watermarked windowed
rollups and a custom stateful sessionizer.

The reference is poll-based batch (cron.go:18-21 — no stream
semantics), so these are the Spark-native *extensions* a live
deployment of the same pipeline needs (SURVEY.md §2.8): the windowed
rollup is the streaming form of the batch `events_rollup` contract
query, and the sessionizer is the canonical applyInPandasWithState
custom stateful operator (gap-based session assembly — not expressible
with built-in windowed aggregation).

Scale notes:
- the watermark bounds state: windows older than (max event time -
  watermark) are finalized and dropped from the state store — without
  it, a 100 TB stream accretes state forever.
- both operators shuffle once on their grouping key; the sessionizer
  keeps ONE small state row per key (last event time + accumulators),
  not the event history.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp,"
    " n_events long, sum_value double"
)
# start/last are DOUBLE epoch seconds: int truncation would make the
# gap comparison and emitted bounds drift from the batch oracle for
# fractional-second event times (ADVICE r2 #3).
SESSION_STATE_SCHEMA = (
    "start double, last double, n long, sum_value double"
)


def windowed_event_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Watermarked tumbling-window rollup of the events stream — the
    streaming twin of the batch events_rollup query (same aggregates).

    Late events within the watermark still land in their window;
    events later than the watermark are dropped and the window's state
    is released. Works identically on a batch frame (no watermark
    needed) — tests pin streaming == batch on the same input."""
    src = events.withColumn("_ts", F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("_ts", watermark)
    return src.groupBy(
        F.window("_ts", window).alias("win"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sum_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n",
        F.round("sum_value", 4).alias("sum_value"),
    )


def dedup_stream(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-ify an at-least-once stream: drop rows whose
    ``id_cols`` already appeared within the watermark window
    (dropDuplicatesWithinWatermark — the state store only keeps keys
    younger than the watermark, so a 100 TB stream's dedup state is
    bounded by the redelivery horizon, not the stream's history).

    On a batch frame the same call degrades to a plain dropDuplicates
    (full-history dedup) — the batch twin the tests pin against. A
    duplicate delivered LATER than the watermark is out of contract
    (the source's redelivery window must fit the watermark), exactly
    as Spark documents for at-least-once sinks."""
    tmp = "__dedup_wm_ts"  # never clobber a caller column named "_ts"
    src = events.withColumn(tmp, F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(tmp, watermark)
        return src.dropDuplicatesWithinWatermark(list(id_cols)).drop(tmp)
    return src.dropDuplicates(list(id_cols)).drop(tmp)


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
    processing_timeout_ms: int | None = None,
) -> DataFrame:
    """Gap-based sessionization via applyInPandasWithState: events of a
    user belong to one session while consecutive gaps stay under
    ``gap_seconds``; a larger gap closes the session and emits one row.

    ``processing_timeout_ms`` arms a wall-clock timeout that flushes an
    idle user's open session — set it on LIVE streams; leave None for
    bounded replays (AvailableNow), where the engine would otherwise
    sit out the timer before terminating and the trailing open session
    is intentionally left in state.

    State per user is four scalars (start, last, count, sum) — O(keys)
    state, never the event history. Emitted rows are final (a closed
    session can't reopen), so downstream sinks can be append-only."""
    src = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("timestamp").cast("double").alias("ets"),
        F.col(value_col).cast("double").alias("value"),
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n, sv = state.get
                state.remove()
                yield _session_row(user, start, last, n, sv)
            return
        if state.exists:
            start, last, n, sv = state.get
        else:
            start = last = None
            n, sv = 0, 0.0
        closed = []
        # vectorized gap splits (VERDICT r2 #8): one sort + np.diff per
        # batch, per-segment sums via reduceat — O(events) numpy work
        # and O(sessions) Python, never a per-event Python loop.
        import numpy as np

        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            ev = pd.concat(frames).sort_values("ets")
            ets = ev["ets"].to_numpy(dtype=np.float64)
            vals = ev["value"].to_numpy(dtype=np.float64)
            if last is not None and ets[0] - last > gap_seconds:
                closed.append((start, last, n, sv))
                start = last = None
                n, sv = 0, 0.0
            seg_lo = np.concatenate(
                ([0], np.flatnonzero(np.diff(ets) > gap_seconds) + 1)
            )
            seg_hi = np.concatenate((seg_lo[1:], [ets.size]))
            seg_n = seg_hi - seg_lo
            seg_sum = np.add.reduceat(vals, seg_lo)
            first = 0
            if last is not None:
                # first segment continues the carried-over open session
                n += int(seg_n[0])
                sv += float(seg_sum[0])
                last = float(ets[seg_hi[0] - 1])
                first = 1
            for i in range(first, seg_lo.size):
                if start is not None:
                    closed.append((start, last, n, sv))
                start = float(ets[seg_lo[i]])
                last = float(ets[seg_hi[i] - 1])
                n = int(seg_n[i])
                sv = float(seg_sum[i])
        if start is None:
            if state.exists:
                state.remove()
            return
        state.update((float(start), float(last), int(n), float(sv)))
        if processing_timeout_ms is not None:
            state.setTimeoutDuration(processing_timeout_ms)
        for s0, s1, cnt, total in closed:
            yield _session_row(user, s0, s1, cnt, total)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if processing_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def _session_row(user, start, last, n, sv) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [int(user)],
            "session_start": [pd.Timestamp(float(start), unit="s")],
            "session_end": [pd.Timestamp(float(last), unit="s")],
            "n_events": [int(n)],
            "sum_value": [float(sv)],
        }
    )


def sessionize_batch_oracle(
    rows: list[tuple[int, float, float]], gap_seconds: int = 1800
) -> list[tuple[int, float, float, int, float]]:
    """Pure-Python sessionization over (user, epoch_s, value) rows —
    the test oracle for ALL sessions (open + closed)."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t, v in rows:
        by_user[u].append((float(t), float(v)))
    out = []
    for u, evs in by_user.items():
        evs.sort()
        start = last = None
        n, sv = 0, 0.0
        for t, v in evs:
            if last is not None and t - last > gap_seconds:
                out.append((u, start, last, n, sv))
                start, n, sv = t, 0, 0.0
            if start is None:
                start = t
            last = t
            n += 1
            sv += v
        if start is not None:
            out.append((u, start, last, n, sv))
    return sorted(out)
