"""Sketch operators: accuracy bounds, merge/parallelism invariance,
and the structural guarantees each sketch advertises.

The oracle-parity mirror already pins exact values; these tests pin
the PROPERTIES that make the sketches usable as planner statistics:
HLL within its theoretical error envelope, Count-Min never
undercounting, KMV exact below k, and every estimate independent of
input partitioning (the repo-wide determinism contract).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from turtle_spark.operators.sketches import (
    CM_DEPTH,
    CM_WIDTH,
    HLL_M,
    KMV_K,
    countmin_estimate,
    countmin_sketch,
    heavy_hitters,
    hll_cardinality,
    kmv_cardinality,
)


@pytest.fixture(scope="module")
def ids_df(spark):
    # 5000 distinct values across 3 groups with different cardinalities
    return spark.range(0, 5000).select(
        (F.col("id") % 3).alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )


def test_hll_within_error_envelope(spark, ids_df):
    """Standard error of HLL at m=4096 is 1.04/sqrt(m) ≈ 1.6 %; allow
    5 sigma.  Groups here have ~1667 distinct values each."""
    rows = hll_cardinality(ids_df, ["g"], "v").collect()
    assert len(rows) == 3
    for r in rows:
        exact = len([i for i in range(5000) if i % 3 == r["g"]])
        assert abs(r["hll_est"] - exact) / exact < 5 * 1.04 / math.sqrt(HLL_M)


def test_hll_duplicates_do_not_move_estimate(spark, ids_df):
    """Registers are max-merged: feeding every value 7 times must give
    the exact same estimate as feeding it once."""
    once = {r["g"]: r["hll_est"] for r in hll_cardinality(ids_df, ["g"], "v").collect()}
    many = ids_df
    for _ in range(3):
        many = many.unionByName(ids_df)
    rep = {r["g"]: r["hll_est"] for r in hll_cardinality(many, ["g"], "v").collect()}
    assert once == rep


def test_hll_partitioning_invariant(spark, ids_df):
    one = {r["g"]: r["hll_est"]
           for r in hll_cardinality(ids_df.coalesce(1), ["g"], "v").collect()}
    wide = {r["g"]: r["hll_est"]
            for r in hll_cardinality(ids_df.repartition(32), ["g"], "v").collect()}
    assert one == wide


def test_kmv_exact_below_k(spark):
    small = spark.range(0, KMV_K - 10).select(
        F.lit(0).alias("g"), F.col("id").cast("string").alias("v")
    )
    [row] = kmv_cardinality(small, ["g"], "v").collect()
    assert row["kmv_est"] == float(KMV_K - 10)


def test_kmv_estimate_above_k(spark, ids_df):
    rows = kmv_cardinality(ids_df, ["g"], "v").collect()
    for r in rows:
        exact = len([i for i in range(5000) if i % 3 == r["g"]])
        # KMV std error ~ 1/sqrt(k-2); allow 5 sigma
        assert abs(r["kmv_est"] - exact) / exact < 5.0 / math.sqrt(KMV_K - 2)


def test_kmv_partitioning_invariant(spark, ids_df):
    one = {r["g"]: r["kmv_est"]
           for r in kmv_cardinality(ids_df.coalesce(1), ["g"], "v").collect()}
    wide = {r["g"]: r["kmv_est"]
            for r in kmv_cardinality(ids_df.repartition(32), ["g"], "v").collect()}
    assert one == wide


def test_countmin_never_undercounts(spark):
    """CM guarantee: est >= true, and est <= true + eps*N w.h.p."""
    tokens = spark.range(0, 2000).select(
        F.concat(F.lit("t"), (F.col("id") % 100)).alias("token")
    )
    sketch = countmin_sketch(tokens)
    est = {
        r["token"]: r["cm_est"]
        for r in countmin_estimate(sketch, tokens.distinct()).collect()
    }
    assert len(est) == 100
    for tok, e in est.items():
        assert e >= 20  # every token appears exactly 20 times
    # total grid mass per depth row == token count
    per_depth = sketch.groupBy("depth").agg(F.sum("cnt").alias("s")).collect()
    assert {r["depth"] for r in per_depth} == set(range(CM_DEPTH))
    assert all(r["s"] == 2000 for r in per_depth)


def test_countmin_grid_is_bounded(spark):
    tokens = spark.range(0, 10000).select(
        F.concat(F.lit("u"), F.col("id")).alias("token")
    )
    assert countmin_sketch(tokens).count() <= CM_DEPTH * CM_WIDTH


def test_heavy_hitters_schema_and_order(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = heavy_hitters(docs, top_n=10).collect()
    assert len(rows) == 10
    assert [r["token"] for r in rows] == [
        r["token"]
        for r in sorted(rows, key=lambda r: (-r["true_cnt"], r["token"]))
    ]
    for r in rows:
        assert r["cm_est"] >= r["true_cnt"]
        assert r["overcount"] == r["cm_est"] - r["true_cnt"]


def test_kmv_quantiles_rank_error_envelope(spark):
    """On 6000 uniform values the k=256 sample's quantile estimates
    must land within a ~5 sigma rank-error band (sigma ~ n/sqrt(k))."""
    from turtle_spark.operators.sketches import kmv_quantiles

    n = 6000
    df = spark.range(0, n).select(
        F.lit("g").alias("g"), F.col("id").alias("rid"), F.col("id").alias("val")
    )
    row = kmv_quantiles(df, ["g"], "val", "rid", k=256).collect()[0]
    assert row["n_kept"] == 256
    band = 5 * n / math.sqrt(256)  # ~1875
    for q, col in ((0.5, "q_p5"), (0.9, "q_p9"), (0.99, "q_p99")):
        true = q * (n - 1)
        assert abs(row[col] - true) <= band, (col, row[col], true)


def test_kmv_quantiles_partitioning_invariant(spark):
    from turtle_spark.operators.sketches import kmv_quantiles

    df = spark.range(0, 3000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("rid"),
        (F.col("id") * 7 % 997).alias("val"),
    )
    a = sorted(tuple(r) for r in kmv_quantiles(df.coalesce(1), ["g"], "val", "rid").collect())
    b = sorted(tuple(r) for r in kmv_quantiles(df.repartition(32), ["g"], "val", "rid").collect())
    assert a == b


def test_kmv_quantiles_merge_associative(spark):
    """Sketching two halves and merging (union of kept rows -> re-take
    min-k on the SAME ordering) must equal sketching the whole — the
    mergeability contract that lets partial sketches compose across
    partitions and snapshots."""
    from turtle_spark.operators.sketches import kmv_quantiles

    df = spark.range(0, 2000).select(
        F.lit("g").alias("g"), F.col("id").alias("rid"),
        (F.col("id") * 13 % 797).alias("val"),
    )
    whole = sorted(tuple(r) for r in kmv_quantiles(df, ["g"], "val", "rid", k=128).collect())
    left = df.where(F.col("rid") < 1000)
    right = df.where(F.col("rid") >= 1000)
    merged = sorted(
        tuple(r)
        for r in kmv_quantiles(left.unionByName(right), ["g"], "val", "rid", k=128).collect()
    )
    assert whole == merged


def test_kmv_quantiles_small_group_is_exact(spark):
    """Groups below k report exact nearest-rank percentiles — the
    sample IS the group there."""
    from turtle_spark.operators.sketches import kmv_quantiles

    df = spark.range(0, 50).select(
        F.lit("g").alias("g"), F.col("id").alias("rid"), F.col("id").alias("val")
    )
    row = kmv_quantiles(df, ["g"], "val", "rid", k=256).collect()[0]
    assert row["n_kept"] == 50
    assert row["q_p5"] == math.floor(0.5 * 49 + 0.5)
    assert row["q_p9"] == math.floor(0.9 * 49 + 0.5)
    assert row["q_p99"] == math.floor(0.99 * 49 + 0.5)


# --------------------------------------------------------------------------
# kmv_set_ops
# --------------------------------------------------------------------------

def test_kmv_set_ops_small_sets_exact(spark):
    from turtle_spark.operators.sketches import kmv_set_ops

    rows = [("A", i) for i in range(40)] + [("B", i) for i in range(20, 70)]
    df = spark.createDataFrame(rows, "s string, v long")
    r = kmv_set_ops(df, "s", "v", "A", "B").collect()[0]
    assert r["exact_a"] == 40 and r["exact_b"] == 50
    assert r["exact_union"] == 70 and r["exact_inter"] == 20
    # both sides below k=128 distinct: the sketch IS the set
    assert r["union_est"] == 70.0
    assert r["jaccard_est"] == round(20 / 70, 6)
    assert r["inter_est"] == round(70.0 * round(20 / 70, 6), 4)


def test_kmv_set_ops_estimates_track_truth(spark):
    from turtle_spark.operators.sketches import kmv_set_ops

    rows = [("A", i) for i in range(3000)] + [("B", i) for i in range(1500, 5500)]
    df = spark.createDataFrame(rows, "s string, v long")
    r = kmv_set_ops(df, "s", "v", "A", "B").collect()[0]
    assert r["exact_union"] == 5500 and r["exact_inter"] == 1500
    assert abs(r["union_est"] - 5500) / 5500 < 0.25
    assert abs(r["inter_est"] - 1500) / 1500 < 0.45  # J-estimate variance is higher
    assert 0.0 < r["jaccard_est"] < 1.0


def test_kmv_set_ops_partition_invariance(spark):
    from turtle_spark.operators.sketches import kmv_set_ops

    rows = [("A", i * 7) for i in range(2000)] + [("B", i * 11) for i in range(2000)]
    df = spark.createDataFrame(rows, "s string, v long")
    one = kmv_set_ops(df.coalesce(1), "s", "v", "A", "B").collect()[0]
    many = kmv_set_ops(df.repartition(9), "s", "v", "A", "B").collect()[0]
    assert one.asDict() == many.asDict()
