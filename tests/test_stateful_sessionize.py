"""Stateful streaming sessionization (applyInPandasWithState).

Pins: (a) in-batch gap closes a session and emits it exactly once;
(b) state carries across micro-batches (events split across files
within the gap fuse into ONE session, closed later by the watermark
timeout); (c) closed sessions agree with the batch sessionizer on the
same events.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from turtle_spark.streaming.stateful import run_sessionize_stream
from turtle_spark.streaming.stream import stream_docs  # noqa: F401  (import parity)

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def test_stateful_sessionize_gap_and_cross_batch(spark, tmp_path):
    # batch 1: user 1 has two bursts separated by > gap (closes one
    # session in-batch); user 2 starts a session
    batch1 = [
        (1, _ts(0), 1, 1.0),
        (2, _ts(5), 1, 1.0),
        (3, _ts(90), 1, 1.0),   # > 30 min after minute 5 -> closes [0, 5]
        (4, _ts(90), 2, 1.0),
    ]
    # batch 2: user 2 continues within the gap (fuses with batch 1);
    # a late user 3 burst far in the future advances the watermark so
    # every open session times out and flushes
    batch2 = [
        (5, _ts(100), 2, 1.0),
        (6, _ts(104), 2, 1.0),
        (7, _ts(2000), 3, 1.0),
        (8, _ts(4000), 3, 1.0),
    ]
    src = tmp_path / "events_src"
    src.mkdir()
    spark.createDataFrame(batch1, EVENTS_SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )
    spark.createDataFrame(batch2, EVENTS_SCHEMA).coalesce(1).write.parquet(
        str(src / "b2")
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out = str(tmp_path / "sessions_out")
    q = run_sessionize_stream(
        stream,
        out,
        str(tmp_path / "ckpt"),
        gap_minutes=30,
        available_now=True,
    )
    q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    sessions = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events) for r in rows
    }
    us = lambda m: int(_ts(m).replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000

    # user 1, first burst: closed by the in-batch gap
    assert (1, us(0), us(5), 2) in sessions
    # user 2: events from batch 1 (min 90) and batch 2 (100, 104) fused
    # into ONE session -> state really crossed the micro-batch boundary
    assert (2, us(90), us(104), 3) in sessions
    # user 1, second burst: closed by watermark timeout
    assert (1, us(90), us(90), 1) in sessions
    # no session may be emitted twice
    assert len(rows) == len(sessions)


def test_stateful_matches_batch_sessionizer(spark, tmp_path):
    """Closed streaming sessions == batch sessionize() on same events."""
    from turtle_spark.operators.sessions import sessionize

    events = [
        (i, _ts(m), u, 1.0)
        for i, (u, m) in enumerate(
            [(1, 0), (1, 10), (1, 100), (1, 105), (2, 3), (2, 50),
             # sentinel user far in the future forces all timeouts
             (9, 10_000), (9, 20_000)]
        )
    ]
    src = tmp_path / "src"
    spark.createDataFrame(events, EVENTS_SCHEMA).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src))
    out = str(tmp_path / "out")
    q = run_sessionize_stream(
        stream, out, str(tmp_path / "ck"), gap_minutes=30, available_now=True
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.read.parquet(out).collect()
        if r.user_id != 9
    }

    bdf = sessionize(
        spark.createDataFrame(events, EVENTS_SCHEMA).where(F.col("user_id") != 9),
        gap_minutes=30,
    )
    to_us = lambda s: int(
        dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc).timestamp()
    ) * 1_000_000
    want = {
        (r.user_id, to_us(r.session_start), to_us(r.session_end), r.n_events)
        for r in bdf.collect()
    }
    assert got == want
