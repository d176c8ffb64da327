"""Bloom filter: no false negatives ever, deterministic false
positives, mergeable build, shuffle-free probe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turtle_spark.operators.bloom import (
    bloom_bits_array,
    bloom_build,
    bloom_probe,
    bloom_prune_report,
)


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 200).select((F.col("id") * 7).alias("k"))


def test_no_false_negatives(spark, keys):
    bits = bloom_bits_array(bloom_build(keys, "k", n_bits=1024), 1024)
    probed = bloom_probe(keys, "k", bits)
    assert probed.where(~F.col("bloom_pass")).count() == 0


def test_definite_non_member_rejected_somewhere(spark, keys):
    """With a roomy filter, the overwhelming majority of non-members
    must be rejected (the filter actually discriminates)."""
    bits = bloom_bits_array(bloom_build(keys, "k", n_bits=1 << 16), 1 << 16)
    non = spark.range(0, 1000).select((F.col("id") * 7 + 3).alias("k"))
    n_pass = bloom_probe(non, "k", bits).where(F.col("bloom_pass")).count()
    assert n_pass <= 5, n_pass


def test_build_partitioning_invariant(spark, keys):
    a = bloom_bits_array(bloom_build(keys.coalesce(1), "k", n_bits=2048), 2048)
    b = bloom_bits_array(bloom_build(keys.repartition(16), "k", n_bits=2048), 2048)
    assert (a == b).all()


def test_build_merge_is_union(spark, keys):
    """Building on two halves and OR-merging the word tables equals
    building on the whole — the mergeability that lets per-snapshot
    blocklist filters compose."""
    import numpy as np

    left = keys.where(F.col("k") < 700)
    right = keys.where(F.col("k") >= 700)
    whole = bloom_bits_array(bloom_build(keys, "k", n_bits=2048), 2048)
    la = bloom_bits_array(bloom_build(left, "k", n_bits=2048), 2048)
    rb = bloom_bits_array(bloom_build(right, "k", n_bits=2048), 2048)
    assert (np.bitwise_or(la, rb) == whole).all()


def test_probe_is_shuffle_free(spark, keys):
    bits = bloom_bits_array(bloom_build(keys, "k", n_bits=1024), 1024)
    big = spark.range(0, 5000).select(F.col("id").alias("k"))
    probed = bloom_probe(big, "k", bits)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_prune_report_counts_consistent(spark):
    big = spark.range(0, 3000).select((F.col("id") % 500).alias("bk"))
    small = spark.range(0, 50).select((F.col("id") * 10).alias("sk"))
    row = bloom_prune_report(big, small, "bk", "sk", n_bits=256).collect()[0]
    assert row["n_total"] == 3000
    # every id%500 in {0,10,...,490} matches: 50 keys x 6 repeats
    assert row["n_true"] == 300
    assert row["n_bloom_pass"] >= row["n_true"]
    assert row["n_false_pos"] == row["n_bloom_pass"] - row["n_true"]
