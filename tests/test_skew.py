"""Salted / two-path skew joins must equal the plain join on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from turtle_spark.operators.skew import salted_join, skew_hint_join, top_keys


def _skewed(spark):
    # key 0 is hot (500 rows), keys 1..20 are cold
    left = spark.range(0, 520).select(
        F.when(F.col("id") < 500, F.lit(0)).otherwise(F.col("id") - 499).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame(
        [(k, f"r{k}") for k in range(0, 21)] + [(0, "r0b")], "k long, rv string"
    )
    return left, right


def _key(rows):
    return sorted((r["k"], r["lv"], r["rv"]) for r in rows)


def test_salted_join_equals_plain_inner(spark):
    left, right = _skewed(spark)
    plain = left.join(right, ["k"]).collect()
    salted = salted_join(left, right, ["k"], n_salts=4).collect()
    assert _key(salted) == _key(plain)
    assert len(plain) == 500 * 2 + 20  # hot key matches both right rows


def test_salted_join_left_keeps_unmatched(spark):
    left, right = _skewed(spark)
    left_plus = left.unionByName(
        spark.createDataFrame([(99, 9999)], "k long, lv long")
    )
    plain = left_plus.join(right, ["k"], "left").collect()
    salted = salted_join(left_plus, right, ["k"], n_salts=4, how="left").collect()
    norm = lambda rows: sorted((r["k"], r["lv"], r["rv"]) for r in rows)
    assert norm(salted) == norm(plain)


def test_top_keys_detects_hot(spark):
    left, _ = _skewed(spark)
    hot = {r["k"] for r in top_keys(left, ["k"], min_count=100).collect()}
    assert hot == {0}


def test_skew_hint_join_equals_plain(spark):
    left, right = _skewed(spark)
    plain = left.join(right, ["k"]).collect()
    hinted = skew_hint_join(left, right, ["k"], hot_threshold=100, n_salts=4).collect()
    assert _key(hinted) == _key(plain)


def test_skew_report_uniform_vs_skewed(spark):
    from turtle_spark.operators.skew import skew_report

    uniform = spark.createDataFrame(
        [(i % 10,) for i in range(1000)], "k long"
    )
    skewed = spark.createDataFrame(
        [(0,)] * 910 + [(i,) for i in range(1, 10)] * 10, "k long"
    )
    u = skew_report(uniform, "k").collect()[0]
    s = skew_report(skewed, "k").collect()[0]
    assert u["n_keys"] == s["n_keys"] == 10
    assert u["gini_x1m"] < 20_000          # near-perfect equality
    assert s["gini_x1m"] > 700_000         # extreme concentration
    assert s["top1_share_x1m"] == 910_000
    assert s["top_keys"].startswith("0:910")
    assert u["p50_cnt"] == 100 and u["p99_cnt"] == 100
    assert s["p50_cnt"] == 10


def test_skew_report_partition_invariance(spark):
    from turtle_spark.operators.skew import skew_report

    df = spark.createDataFrame(
        [((i * i) % 37,) for i in range(2000)], "k long"
    )
    one = skew_report(df.coalesce(1), "k").collect()[0].asDict()
    many = skew_report(df.repartition(11), "k").collect()[0].asDict()
    assert one == many


def test_skew_report_plan_has_no_unpartitioned_window(spark):
    from turtle_spark.operators.skew import skew_report
    from tests.test_layout import _unpartitioned_windows

    df = spark.createDataFrame(
        [(f"k{i % 13}",) for i in range(400)], "k string"
    )
    rep = skew_report(df, "k")
    assert _unpartitioned_windows(rep) == []
