"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch engine sessionizes with a lag/sum window
(operators/sessions.py); a live stream can't window over the future, so
this is the streaming twin: per-user session state (start, last-seen,
count, value sum) lives in the state store, sessions CLOSE either when
an in-batch gap exceeds the threshold or when the event-time watermark
passes ``last_seen + gap`` (timeout path).  Closed sessions are emitted
exactly once; open sessions ride in state across micro-batches.

Scale notes: state is keyed by user — shuffling is one hash exchange on
the grouping key, identical to the batch window's partitioning; the
state store grows with ACTIVE users only, because every timeout removes
its key.  Batch/stream parity is pinned by a test that replays the same
events through both paths.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30, watermark: str = "10 minutes") -> DataFrame:
    """events(user_id, ts, ...) stream -> closed-session stream.

    Works on a streaming DataFrame; ``ts`` must be castable to
    TIMESTAMP.  Emits one row per CLOSED session.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "n_events": [n],
                }
            )
            return

        start_us = last_us = None
        n = 0
        if state.exists:
            start_us, last_us, n = state.get

        closed: list[tuple[int, int, int]] = []
        for pdf in pdfs:
            micros = (
                pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
            ).tolist()
            for ts in sorted(micros):
                if start_us is None:
                    start_us, last_us, n = ts, ts, 1
                elif ts - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, last_us, n = ts, ts, 1
                else:
                    last_us = max(last_us, ts)
                    n += 1

        if start_us is not None:
            state.update((start_us, last_us, n))
            # close via timeout once the event-time watermark passes the
            # session gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    withmark = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return (
        withmark.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionize_stream(
    events_stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    gap_minutes: int = 30,
    available_now: bool = False,
):
    """Wire the stateful sessionizer to a parquet sink."""
    sessions = sessionize_stream(events_stream, gap_minutes=gap_minutes)
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
