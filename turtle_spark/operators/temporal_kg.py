"""Bitemporal triple store operations.

A canonical graph at web scale is never static: every re-crawl
asserts and retracts facts, so the materialized triple table carries
validity intervals ``[valid_from, valid_to)`` and queries run AS OF a
timestamp.  This module provides the three primitives:

- ``coalesce_intervals`` — temporal normalization: merge overlapping
  or adjacent validity intervals of the SAME logical triple (the
  classic islands-and-gaps problem).  Distributed shape: one shuffle
  on the 8-byte triple-key hash, a running-max window to mark island
  starts, a running-sum window to number islands (both windows reuse
  the same partitioning/exchange), one aggregate.  No self-joins —
  the naive "overlaps" self-join is quadratic per hot key.
- ``as_of`` — point-in-time snapshot: a pure filter
  (``valid_from <= t < valid_to``), pushed to the scan at rest.
- ``temporal_delta`` — what changed between two timestamps: two
  as-of filters over ONE pass of the history + the same anti-join
  compare as ``graph.snapshot_delta``.

``synth_history`` manufactures a deterministic version history from a
static triple set (hash-derived interval endpoints, ~half of adjacent
versions overlapping) so coalescing, snapshots, and deltas are
exercised — and golden-mirrored — without external data, the same
synthesize-then-verify pattern as the media table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TRIPLE_KEY = ["subject", "predicate", "object", "label", "datatype", "objecttype"]


def _key_hash() -> F.Column:
    """8-byte shuffle key for the logical triple — the window/group
    key at 10^12 scale; a 64-bit collision merges two chains' islands,
    which the hash-mirroring golden reproduces bit-for-bit."""
    return F.xxhash64(F.concat_ws("|", *TRIPLE_KEY))


def synth_history(triples: DataFrame, versions_mod: int = 3) -> DataFrame:
    """Deterministic version history: each distinct triple gets
    1..versions_mod versions at 1000-tick spacing; version i covers
    ``[i*1000 + h%400, start + 300 + h%1400)`` so ~half of adjacent
    versions overlap (coalescing has real work) and the rest leave
    gaps (the triple was retracted and re-asserted)."""
    h = F.abs(_key_hash())
    base = triples.dropDuplicates(TRIPLE_KEY).select(
        *TRIPLE_KEY,
        F.pmod(h, F.lit(versions_mod)).cast("int").alias("_nv"),
        F.pmod(h, F.lit(400)).alias("_off"),
        F.pmod(h, F.lit(1400)).alias("_len"),
    )
    v = F.explode(F.sequence(F.lit(0), F.col("_nv"))).alias("version")
    out = base.select(*TRIPLE_KEY, "_off", "_len", v)
    vfrom = F.col("version") * 1000 + F.col("_off")
    return out.select(
        *TRIPLE_KEY,
        vfrom.alias("valid_from"),
        (vfrom + 300 + F.col("_len")).alias("valid_to"),
    )


def coalesce_intervals(hist: DataFrame) -> DataFrame:
    """Merge overlapping/adjacent ``[valid_from, valid_to)`` intervals
    per logical triple.  Half-open semantics: ``[0,5)`` and ``[5,9)``
    are adjacent and merge; ``[0,5)`` and ``[6,9)`` do not.

    Both windows partition by the same key, so Catalyst plans ONE
    exchange + one sort for the pair; the aggregate reuses them."""
    w = Window.partitionBy("_k").orderBy("valid_from", "valid_to")
    prev_max_end = F.max("valid_to").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = (
        hist.withColumn("_k", _key_hash())
        .withColumn(
            "_new_island",
            F.when(
                prev_max_end.isNull() | (F.col("valid_from") > prev_max_end),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_island",
            F.sum("_new_island").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        marked.groupBy("_k", "_island")
        .agg(
            *[F.first(c).alias(c) for c in TRIPLE_KEY],
            F.min("valid_from").alias("valid_from"),
            F.max("valid_to").alias("valid_to"),
        )
        .drop("_k", "_island")
    )


def as_of(hist: DataFrame, ts: int) -> DataFrame:
    """Snapshot of the graph at tick ``ts`` (pure filter — pushes to
    the scan when the history is at rest)."""
    return hist.where(
        (F.col("valid_from") <= F.lit(ts)) & (F.lit(ts) < F.col("valid_to"))
    ).select(*TRIPLE_KEY)


def temporal_delta(hist: DataFrame, t1: int, t2: int) -> DataFrame:
    """Per-predicate added/removed between snapshots at ``t1`` and
    ``t2`` — one pass over the history feeding both filters, compared
    by the same full-key anti-joins as ``graph.snapshot_delta``."""
    from turtle_spark.operators.graph import snapshot_delta

    return snapshot_delta(as_of(hist, t1), as_of(hist, t2))
