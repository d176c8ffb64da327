"""Structured Streaming surfaces.

The reference is a batch parser and the KG pipeline is batch-manifest
based (SURVEY.md §2.2), but a production corpus *arrives* continuously,
so the engine exposes streaming equivalents of its two ingestion-side
operators:

* ``stream_docs`` + ``stream_extract_triples`` — a file-watch stream of
  docs parquet that runs the SAME Arrow-batched extraction per
  micro-batch via ``foreachBatch`` (the parse operator is stateless per
  document, so batch and streaming share one implementation — no
  semantic drift between the two paths);
* ``windowed_event_counts`` — watermarked tumbling-window aggregation
  over an event stream (late data handled by the watermark).

Tests run with ``trigger(availableNow=True)`` against static parquet —
the same code path a live stream takes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from turtle_spark.operators.extract import extract_triples
from turtle_spark.sources.corpus import DOCS_SCHEMA


def stream_docs(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-watch stream over a docs-table directory (parquet)."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_extract_triples(
    docs_stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
):
    """Continuously extract triples from arriving documents.

    ``foreachBatch`` reuses the batch extraction operator verbatim, and
    the sink is append-only parquet with exactly-once semantics from
    the streaming checkpoint.  Returns the started query.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        extract_triples(batch_df).write.mode("append").parquet(output_path)

    writer = (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type.

    Works on both a streaming and a batch events DataFrame (the
    watermark is a no-op in batch), so the oracle check can run the
    same logic through DuckDB on static data.
    """
    # watermarks require TIMESTAMP (with zone); parquet sources often
    # carry TIMESTAMP_NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "min_value",
            "max_value",
        )
    )


def stream_windowed_counts(
    events_stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = False,
):
    """Streaming windowed aggregation to a parquet sink (append mode
    emits only watermark-finalized windows)."""
    agg = windowed_event_counts(events_stream, window=window, watermark=watermark)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming exact dedup — tier 1 of the dedup family for a
    continuously-arriving corpus.

    With ``ts_col``: ``dropDuplicatesWithinWatermark`` keyed on
    ``key_cols`` — state is BOUNDED by the watermark horizon, which is
    the only shape that survives an unbounded 100 TB stream (a key's
    fingerprint is held only until the watermark passes it).  Without
    ``ts_col``: plain ``dropDuplicates`` — exact global dedup with
    state that grows with distinct keys; acceptable for finite
    backfills only, and documented as such.
    """
    if ts_col is None:
        return stream.dropDuplicates(key_cols)
    withts = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return withts.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def stream_dedup_to_parquet(
    stream: DataFrame,
    key_cols: list[str],
    output_path: str,
    checkpoint_path: str,
    ts_col: str | None = None,
    watermark: str = "24 hours",
    available_now: bool = False,
):
    """Run ``stream_dedup`` into an append-only parquet sink."""
    deduped = stream_dedup(stream, key_cols, ts_col=ts_col, watermark=watermark)
    writer = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
