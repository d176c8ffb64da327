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
