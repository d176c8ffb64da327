"""Deterministic hash sampling: stability, nesting, stratification,
and md5-cutoff parity with DuckDB (the oracle contract)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from turtle_spark.operators.sampling import (
    _cutoff_hex,
    deterministic_sample,
    sample_sql_predicate,
    stratified_sample,
)


def test_cutoff_hex_bounds():
    assert _cutoff_hex(0.0) == "00000000"
    assert _cutoff_hex(1.0) == "g"  # above every hex digest
    assert _cutoff_hex(0.5) == "80000000"
    with pytest.raises(ValueError):
        _cutoff_hex(1.5)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_sample_deterministic_and_nested(spark, events):
    s10a = deterministic_sample(events, ["event_id"], 0.10)
    s10b = deterministic_sample(events.repartition(7), ["event_id"], 0.10)
    ids_a = {r.event_id for r in s10a.select("event_id").collect()}
    ids_b = {r.event_id for r in s10b.select("event_id").collect()}
    assert ids_a == ids_b  # partitioning-independent

    s25 = deterministic_sample(events, ["event_id"], 0.25)
    ids_25 = {r.event_id for r in s25.select("event_id").collect()}
    assert ids_a <= ids_25  # samples nest: 10% subset of 25%

    n = events.count()
    assert 0.05 * n < len(ids_a) < 0.15 * n
    assert 0.19 * n < len(ids_25) < 0.31 * n


def test_sample_matches_duckdb(events, sf_dir):
    """The Spark keep/drop set is BIT-IDENTICAL to the SQL predicate —
    the property every oracle-checked sample rests on."""
    spark_ids = {
        r.event_id
        for r in deterministic_sample(events, ["event_id"], 0.2)
        .select("event_id")
        .collect()
    }
    con = duckdb.connect()
    pred = sample_sql_predicate(["event_id"], 0.2)
    duck_ids = {
        r[0]
        for r in con.execute(
            f"SELECT event_id FROM read_parquet('{sf_dir}/events.parquet') WHERE {pred}"
        ).fetchall()
    }
    con.close()
    assert spark_ids == duck_ids


def test_stratified_fractions(spark, events):
    sampled = stratified_sample(
        events,
        strata_col="event_type",
        key_cols=["event_id"],
        fractions={"click": 0.5, "error": 0.0},
        default_fraction=0.1,
    )
    got = {
        r.event_type: r.n
        for r in sampled.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert "error" not in got  # fraction 0 -> empty stratum
    assert 0.35 < got["click"] / totals["click"] < 0.65
    for t in set(totals) - {"click", "error"}:
        assert got.get(t, 0) / totals[t] < 0.2


def test_sample_is_pure_filter(events):
    """No shuffle: the sample must stay a scan+filter so it composes
    with pushdown and costs one pass at any scale."""
    plan = deterministic_sample(events, ["event_id"], 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
