"""Change-data-capture log compaction: latest-wins upsert semantics.

The materialization stage of the KG pipeline is append-oriented
(subject-hash-bucketed triple tables); when the input is a change
*log* — re-crawled documents, corrected triples, mutable entity
attributes — downstream consumers need the compacted "current state"
view.  ``latest_by_key`` is that operator: one window over the change
log picks each key's newest version, with a total deterministic order
so replays and task retries always agree.

At scale this is one shuffle on the compaction key.  When the log is
bucketed by the same key (sources/storage.py writes bucketed tables),
the shuffle disappears entirely — the window runs within buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    log: DataFrame,
    keys: Sequence[str],
    version_cols: Sequence[str],
) -> DataFrame:
    """Keep each key's newest row from a change log.

    ``version_cols`` must be a total order within a key (e.g.
    ``["ts", "event_id"]`` — always include a unique tiebreaker:
    with timestamp-only versions two changes in the same microsecond
    would be picked nondeterministically under retries).
    """
    if not keys or not version_cols:
        raise ValueError("keys and version_cols must be non-empty")
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in version_cols]
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_history(
    log: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    version_cols: Sequence[str],
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 build from a change log: one
    validity-interval row per (key, attribute-state) RUN — the
    warehouse-standard history table (`latest_by_key` is the Type 1
    "current state" compaction; this keeps every state with
    valid-from/valid-to so as-of queries join history exactly).

    Consecutive versions with UNCHANGED ``attr_cols`` collapse into
    one interval (gaps-and-islands: a new island starts where any
    attribute differs from the previous version); each interval's
    ``valid_from`` is its first version, ``valid_to`` the next
    interval's first version (NULL while current), ``is_current``
    flags the open row.

    One shuffle on the key (two windows + one aggregation over the
    same partitioning — Spark reuses the exchange); like
    ``latest_by_key``, a log bucketed by the key runs window-local.
    ``version_cols`` must totally order within a key.
    """
    if not keys or not attr_cols or not version_cols:
        raise ValueError("keys, attr_cols and version_cols must be non-empty")
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in version_cols])
    run = Window.partitionBy(*keys).orderBy(
        *[F.col(c).asc() for c in version_cols]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    changed = F.lit(False)
    for a in attr_cols:
        # null-safe: a NULL state is a real state, and a plain ==
        # yields NULL (not false) across a null transition, which
        # would silently drop the island break
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first_version = F.lag(F.col(version_cols[0])).over(w).isNull()
    islands = log.select(*keys, *attr_cols, *version_cols).withColumn(
        "_new", (first_version | changed).cast("int")
    ).withColumn("_island", F.sum("_new").over(run))
    per_island = islands.groupBy(*keys, "_island").agg(
        *[F.first(a).alias(a) for a in attr_cols],
        F.min(version_cols[0]).alias("valid_from"),
        F.max("_island").alias("_i"),
    )
    w_next = Window.partitionBy(*keys).orderBy("_island")
    return (
        per_island.withColumn(
            "valid_to", F.lead("valid_from").over(w_next)
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_island", "_i")
    )
