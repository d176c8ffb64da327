"""Multi-dimensional file layout: Z-order clustering + pruning report.

At 100 TB the dominant cost of a selective query is how many files its
predicate touches.  A single-column sort prunes one dimension and
shreds every other; Z-ORDER interleaves the bits of two dimensions so
files cover small rectangles of the (a, b) space and BOTH dimensions
prune — the technique behind Delta/Iceberg `ZORDER BY` table layout.

Everything here is exact integer arithmetic so layouts and reports are
bit-identical at any parallelism and in the DuckDB oracle:

* ``z_value`` interleaves two 31-bit non-negative ints into one
  62-bit Morton key with the shift-mask spread chain (no loops, no
  UDF — five JVM bitwise ops per dimension);
* file assignment is by Z-rank: ``file = rank * n_files / N`` with
  integer division.  The global sort this implies is the test-scale
  stand-in for ``repartitionByRange``-with-fixed-boundaries at
  cluster scale (sampled range boundaries would break run-to-run
  determinism, so the boundaries of a production layout job come from
  the quantile sketch, not sampling — see operators/sketches.py).

The report compares Z-order against the single-column sort layout on
the SAME selection: files touched, selected rows, rows resident in
touched files — the read-amplification a scan planner actually pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread(c: Column) -> Column:
    """Spread the low 31 bits of a non-negative long so consecutive
    input bits land two apart (Morton magic-number chain)."""
    x = c.bitwiseAND(F.lit(0x7FFFFFFF))
    for shift, mask in _MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def z_value(a: Column, b: Column) -> Column:
    """62-bit Morton key interleaving two 31-bit non-negative ints
    (``a`` in even bit positions, ``b`` odd) — always non-negative, so
    longs sort in Z-curve order."""
    return _spread(a).bitwiseOR(F.shiftleft(_spread(b), 1))


def zorder_files(
    df: DataFrame,
    a_col: str,
    b_col: str,
    n_files: int = 64,
) -> DataFrame:
    """Assign each row its Z-layout file id (0..n_files-1), equal-depth
    by Z-rank.  Adds columns ``z`` and ``file``."""
    from turtle_spark.operators.skew import pin

    # pinned: the rank window and the row-count branch both read this
    # subtree (and pruning_report layers two more references on top)
    zed = pin(df.withColumn("z", z_value(F.col(a_col), F.col(b_col))))
    w = Window.orderBy("z", a_col, b_col)
    n = zed.select(F.count("*").alias("n"))
    return (
        zed.withColumn("_rn", F.row_number().over(w) - 1)
        .join(F.broadcast(n))
        .withColumn(
            "file", F.expr(f"CAST(_rn * {n_files} div n AS INT)")
        )
        .drop("_rn", "n")
    )


def pruning_report(
    df: DataFrame,
    a_col: str,
    b_col: str,
    selection: Column,
    n_files: int = 64,
) -> DataFrame:
    """Compare Z-order vs single-column-sort layouts for one selection.

    Returns two rows (layout = 'zorder' | 'linear_a') with
    ``files_touched``, ``rows_selected``, ``rows_in_touched_files`` —
    read amplification = rows_in_touched_files / rows_selected.  All
    counts int64; the one double division is exact-int operands.
    """
    from turtle_spark.operators.skew import pin

    zed = zorder_files(df, a_col, b_col, n_files).withColumn(
        "_sel", selection.cast("int")
    )
    w_lin = Window.orderBy(a_col, b_col)
    # pinned: both layouts' per-file aggregates descend from this one
    # table — without the pin each of the four aggregate branches
    # re-scans the source and re-sorts both layouts
    both = pin(
        zed.withColumn("_rn", F.row_number().over(w_lin) - 1)
        .join(F.broadcast(zed.select(F.count("*").alias("n"))))
        .withColumn("file_lin", F.expr(f"CAST(_rn * {n_files} div n AS INT)"))
        .drop("_rn", "n")
    )

    def layout_stats(file_col: str, name: str) -> DataFrame:
        per_file = both.groupBy(F.col(file_col).alias("f")).agg(
            F.sum("_sel").alias("sel"), F.count("*").alias("rows")
        )
        return per_file.agg(
            F.lit(name).alias("layout"),
            F.sum(F.when(F.col("sel") > 0, 1).otherwise(0))
            .cast("long")
            .alias("files_touched"),
            F.sum("sel").cast("long").alias("rows_selected"),
            F.sum(F.when(F.col("sel") > 0, F.col("rows")).otherwise(0))
            .cast("long")
            .alias("rows_in_touched_files"),
        )

    out = layout_stats("file", "zorder").unionByName(
        layout_stats("file_lin", "linear_a")
    )
    return out.select(
        "layout",
        "files_touched",
        "rows_selected",
        "rows_in_touched_files",
        (
            F.col("rows_in_touched_files").cast("double")
            / F.col("rows_selected")
        ).alias("read_amplification"),
    )
