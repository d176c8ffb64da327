"""Time-series downsampling for dashboards and visual analytics.

``lttb_downsample`` is the Largest-Triangle-Three-Buckets shape
selector (Steinarsson 2013) in its *parallel* form: classic LTTB uses
the previously SELECTED point as the left triangle anchor, which makes
the scan inherently sequential per series.  The standard scalable
variant anchors every bucket's triangles on its NEIGHBOR BUCKETS' MEAN
points instead — every bucket is then independent, so a series of any
length downsamples in one pass of window functions + one aggregation,
with no per-series sequential tail.  (On real series the two variants
pick near-identical points; the deviation is documented, deterministic,
and the price of losing the sequential dependency.)

Determinism at any parallelism — the argmax must not flip with
aggregation order, so no floating sums are ever aggregated:

* time enters as exact int64 epoch-MICROseconds relative to the series
  start (the offset cancels; microsecond exactness keeps sub-second
  orderings);
* the value column enters as exact int64 fixed-point
  (``CAST(value * 1000 AS BIGINT)`` — double->bigint truncation is
  identical in Spark and DuckDB);
* bucket anchors are exact integer sums divided ONCE into doubles, and
  the triangle area is a fixed-shape double expression over those
  deterministic operands — bit-identical regardless of partitioning,
  and bit-identical between Spark and the DuckDB oracle;
* area ties break on the stable (event_id) key.

Bucketing is the classic index split: first and last point keep their
own buckets (endpoints always survive), the interior splits evenly by
row index.  A series with <= n_out points passes through unchanged.

Plan shape at scale: one sort-shuffle per series partition for the row
index (inherent to index bucketing), one map-side-combined aggregation
for bucket sums, a broadcast-sized bucket table joined back, one
window argmax.  Series are independent — skew equals the hottest
single series, the same bound a per-series ``applyInPandas`` would
have, without leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lttb_downsample(
    events: DataFrame,
    n_out: int = 60,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    value_scale: int = 1000,
) -> DataFrame:
    """Downsample each series to ``n_out`` shape-preserving points.

    Returns (series_col, bucket, id_col, ts_col, v_fixed) — ``v_fixed``
    is the fixed-point int64 the selection ran on (``value *
    value_scale`` truncated), kept in the output so the result is
    integer-exact for hashing.
    """
    n = n_out
    w_series = Window.partitionBy(series_col).orderBy(ts_col, id_col)
    w_all = Window.partitionBy(series_col)
    pts = (
        events.select(
            F.col(series_col),
            F.col(id_col),
            F.col(ts_col),
            # parquet timestamps arrive as TIMESTAMP_NTZ; the session
            # timezone is pinned UTC, so this cast is the identity map
            # onto DuckDB's epoch_us of the naive value
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t_us"),
            (F.col(value_col) * value_scale).cast("long").alias("v_fixed"),
        )
        .withColumn("idx", F.row_number().over(w_series) - 1)
        .withColumn("cnt", F.count("*").over(w_all))
        .withColumn("t_rel", F.col("t_us") - F.min("t_us").over(w_all))
        .withColumn(
            "bucket",
            F.when(F.col("cnt") <= n, F.col("idx"))
            .when(F.col("idx") == 0, F.lit(0))
            .when(F.col("idx") == F.col("cnt") - 1, F.lit(n - 1))
            .otherwise(
                1
                + F.floor(
                    (F.col("idx") - 1) * F.lit(n - 2) / (F.col("cnt") - 2)
                ).cast("int")
            ),
        )
    )
    bstats = pts.groupBy(series_col, "bucket").agg(
        F.sum("t_rel").alias("st"),
        F.sum("v_fixed").alias("sv"),
        F.count("*").alias("c"),
    )
    w_b = Window.partitionBy(series_col).orderBy("bucket")
    anchors = (
        bstats.withColumn("tp", F.lag("st").over(w_b) / F.lag("c").over(w_b))
        .withColumn("vp", F.lag("sv").over(w_b) / F.lag("c").over(w_b))
        .withColumn("tn", F.lead("st").over(w_b) / F.lead("c").over(w_b))
        .withColumn("vn", F.lead("sv").over(w_b) / F.lead("c").over(w_b))
        .select(series_col, "bucket", "tp", "vp", "tn", "vn")
    )
    # the bucket table is ~n_out rows per series — broadcast-sized
    scored = pts.join(F.broadcast(anchors), [series_col, "bucket"]).withColumn(
        "area",
        F.abs(
            (F.col("tp") - F.col("tn"))
            * (F.col("v_fixed").cast("double") - F.col("vp"))
            - (F.col("tp") - F.col("t_rel").cast("double"))
            * (F.col("vn") - F.col("vp"))
        ),
    )
    w_pick = Window.partitionBy(series_col, "bucket").orderBy(
        F.desc_nulls_last("area"), F.col(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w_pick))
        .where(F.col("_rn") == 1)
        .select(series_col, "bucket", id_col, ts_col, "v_fixed")
    )
