"""Temporal joins the built-in DataFrame API lacks: as-of and interval.

Both are implemented as compositions of existing operators (shuffle on
the equi-key + window / bucketed equi-join), never per-key collects —
the same plans run unchanged on a 1000-executor cluster.

``asof_join`` — for each left row, the single most recent right row
with ``right_ts <= left_ts`` and equal keys.  Physical shape: tag both
sides, union, ONE shuffle on the key, running ``last(..., ignorenulls)``
window.  This beats the naive inequality join (which Spark executes as
BroadcastNestedLoopJoin or a full sort-merge-with-range) because the
window pass is O(n log n) per key group and never materializes the
quadratic candidate set.

``interval_join`` — (point, interval) pairs with
``start <= point_ts <= end``.  Physical shape: intervals are exploded
into the coarse time buckets they cover, points bucketed to one key
each, equi-join on (key, bucket) then exact range filter — the classic
bucketed range join; choose ``bucket_width`` ≈ median interval length
so each interval lands in O(1) buckets.  With AQE on, skewed buckets
(rush-hour data) are split at runtime.

The reference (nvkp/turtle) has no joins at all (SURVEY.md §2.2); these
are pipeline operators for the events/session side of the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "",
) -> DataFrame:
    """Left as-of join: latest right row with ``right_ts <= left_ts``.

    Right rows must be unique per (key, right_ts); pre-aggregate if not
    (otherwise "the" most recent row is ill-defined in any engine).

    Returns all left columns plus ``right_cols`` (renamed with
    ``suffix``), null when no right row precedes the left timestamp.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    out_names = {c: c + suffix for c in right_cols}

    # the matched right row travels as ONE struct, filled by ONE
    # last(ignorenulls) window call — filling each column independently
    # would mix values from different right rows whenever the most
    # recent right row has NULL in some column (a row that never
    # existed); a NULL field inside the matched struct stays NULL
    from pyspark.sql import types as T

    l_struct = T.StructType([T.StructField(c, left.schema[c].dataType) for c in left.columns])
    r_struct = T.StructType([T.StructField(c, right.schema[c].dataType) for c in right_cols])
    lhs = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_struct).alias("_r"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_struct).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    # one shuffle on the key; right rows sort before left rows at equal
    # timestamps so a right row AT the left timestamp is visible
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = lhs.unionByName(rhs)
    filled = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_f")
    )
    return (
        filled.where(F.col("_side") == 1)
        .select(
            F.col("_l.*"),
            *[F.col(f"_f.{c}").alias(out_names[c]) for c in right_cols],
        )
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Inner join of points to every interval containing them.

    Equi-join on (key, coarse time bucket) + exact range filter; the
    interval side explodes into the buckets it covers.  Intervals and
    points must share the key columns ``on`` (may be empty for a global
    range join — then bucketing alone bounds the fan-out).
    """
    width = F.lit(bucket_width_s)
    p_bucket = (F.unix_timestamp(F.col(point_ts)) / width).cast("long")
    i_lo = (F.unix_timestamp(F.col(start_col)) / width).cast("long")
    i_hi = (F.unix_timestamp(F.col(end_col)) / width).cast("long")

    pts = points.withColumn("_bucket", p_bucket)
    ivs = intervals.withColumn(
        "_bucket", F.explode(F.sequence(i_lo, i_hi))
    )
    joined = pts.join(ivs, on=[*on, "_bucket"]).where(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_bucket")
