"""Z-order layout (operators/layout.py): Morton key correctness and
the pruning advantage the layout exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from turtle_spark.operators.layout import pruning_report, z_value, zorder_files


def _morton_py(a: int, b: int) -> int:
    z = 0
    for i in range(31):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_bitloop(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (2**31 - 1, 2**31 - 1), (12345, 67890)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.select("a", "b", z_value(F.col("a"), F.col("b")).alias("z")).collect()
    for r in out:
        assert r["z"] == _morton_py(r["a"], r["b"]), (r["a"], r["b"])
        assert r["z"] >= 0


def test_z_order_is_locality_preserving(spark):
    # points in the same small square get nearer z-values than points
    # in a far square: check the classic 2x2 block ordering 0,1,2,3
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0)], "a long, b long"
    )
    z = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", z_value(F.col("a"), F.col("b")).alias("z")).collect()
    }
    assert z[(0, 0)] < z[(1, 0)] < z[(0, 1)] < z[(1, 1)] < z[(2, 0)]


def test_zorder_files_are_balanced_and_deterministic(spark):
    rows = [(i % 97, (i * 13) % 89) for i in range(1000)]
    df = spark.createDataFrame(rows, "a long, b long")
    sizes = {
        r["file"]: r["n"]
        for r in zorder_files(df, "a", "b", n_files=10)
        .groupBy("file").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == set(range(10))
    assert all(v == 100 for v in sizes.values())
    again = {
        r["file"]: r["n"]
        for r in zorder_files(df.repartition(7), "a", "b", n_files=10)
        .groupBy("file").agg(F.count("*").alias("n")).collect()
    }
    assert again == sizes


def test_pruning_report_zorder_beats_linear(spark):
    # uniform grid: selection is a square in the middle of BOTH dims;
    # a linear-a layout must read every b for the selected a-range
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    sel = (F.col("a") >= 16) & (F.col("a") < 32) & (F.col("b") >= 16) & (F.col("b") < 32)
    rep = {
        r["layout"]: r
        for r in pruning_report(df, "a", "b", sel, n_files=64).collect()
    }
    z, lin = rep["zorder"], rep["linear_a"]
    assert z["rows_selected"] == lin["rows_selected"] == 16 * 16
    assert z["read_amplification"] < lin["read_amplification"]
    assert z["files_touched"] < lin["files_touched"]
