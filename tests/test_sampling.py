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


# --------------------------------------------------------------------------
# mixture sampling (water-filling corpus composition)
# --------------------------------------------------------------------------

from turtle_spark.functions.mixture import mixture_fractions  # noqa: E402
from turtle_spark.operators.sampling import mixture_sample, sample_hash  # noqa: E402


def test_mixture_fractions_plain_split():
    # everyone has plenty: fractions follow the weights exactly
    fr = mixture_fractions({"a": 100, "b": 100}, {"a": 0.75, "b": 0.25}, 40)
    assert fr == {"a": 30 / 100, "b": 10 / 100}


def test_mixture_fractions_clamp_and_redistribute():
    # "a" wants 30 but only has 10 -> clamped to 1.0; the unused 20
    # rows flow to b and c in weight proportion (1:1 -> 10 each)
    fr = mixture_fractions(
        {"a": 10, "b": 100, "c": 100}, {"a": 0.6, "b": 0.2, "c": 0.2}, 50
    )
    assert fr["a"] == 1.0
    assert fr["b"] == fr["c"] == 20 / 100


def test_mixture_fractions_budget_exceeds_corpus():
    fr = mixture_fractions({"a": 5, "b": 5}, {"a": 0.5, "b": 0.5}, 100)
    assert fr == {"a": 1.0, "b": 1.0}  # never upsamples past 1.0


def test_mixture_fractions_empty_and_missing_buckets():
    # zero-count and absent buckets get no allocation (and no KeyError)
    fr = mixture_fractions({"a": 10}, {"a": 0.5, "ghost": 0.5}, 10)
    assert fr == {"a": 1.0}
    with pytest.raises(ValueError):
        mixture_fractions({"a": 1}, {"a": 0.0}, 1)
    with pytest.raises(ValueError):
        mixture_fractions({"a": 1}, {"a": 1.0}, -1)


def test_mixture_fractions_deterministic_rounding():
    # 3-way split of 10 rows: largest-remainder with name tiebreak
    fr1 = mixture_fractions({c: 100 for c in "abc"}, {c: 1 / 3 for c in "abc"}, 10)
    fr2 = mixture_fractions({c: 100 for c in "abc"}, {c: 1 / 3 for c in "abc"}, 10)
    assert fr1 == fr2
    assert sum(int(round(f * 100)) for f in fr1.values()) == 10


def test_mixture_sample_composition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights = {"src0": 0.5, "src1": 0.25, "src2": 0.15, "src3": 0.1}
    out = mixture_sample(docs, "source", ["doc_id"], weights, budget=60)
    rows = out.collect()
    # only weighted buckets survive
    assert {r.source for r in rows} <= set(weights)
    # membership is the md5-cutoff contract: recompute per row
    counts = {
        r[0]: r[1]
        for r in docs.where(F.col("source").isin(list(weights)))
        .groupBy("source").count().collect()
    }
    fracs = mixture_fractions(counts, weights, 60)
    expected = {
        (r.doc_id, r.source)
        for r in docs.withColumn("_h", sample_hash("doc_id")).collect()
        if r.source in fracs and r._h < _cutoff_hex(fracs[r.source])
    }
    assert {(r.doc_id, r.source) for r in rows} == expected
    # partitioning-independent
    out2 = mixture_sample(docs.repartition(13), "source", ["doc_id"], weights, 60)
    assert {(r.doc_id, r.source) for r in out2.collect()} == expected


# --------------------------------------------------------------------------
# group-keyed splits (split_assign / leakage_safe_split)
# --------------------------------------------------------------------------

def test_split_assign_group_atomicity(spark):
    from turtle_spark.operators.sampling import split_assign

    rows = [(i, i % 10) for i in range(200)]
    df = spark.createDataFrame(rows, "row_id long, grp long")
    out = split_assign(df, "grp", {"train": 0.8, "val": 0.1, "test": 0.1})
    per_group = (
        out.groupBy("grp").agg(F.count_distinct("split").alias("n")).collect()
    )
    assert all(r["n"] == 1 for r in per_group)  # a group never straddles
    # partitioning independence
    a = sorted((r["row_id"], r["split"]) for r in out.collect())
    b = sorted(
        (r["row_id"], r["split"])
        for r in split_assign(
            df.repartition(13), "grp", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    )
    assert a == b


def test_split_assign_matches_duckdb(spark):
    from turtle_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in range(1000)], "grp long")
    out = {
        r["grp"]: r["split"]
        for r in split_assign(
            df, "grp", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    c1, c2 = _cutoff_hex(0.8), _cutoff_hex(0.8 + 0.1)
    duck = duckdb.sql(
        f"""
        SELECT g, CASE WHEN h < '{c1}' THEN 'train'
                       WHEN h < '{c2}' THEN 'val'
                       ELSE 'test' END AS split
        FROM (SELECT g, substring(md5('split|' || CAST(g AS VARCHAR)), 1, 8) AS h
              FROM range(1000) t(g))
        """
    ).fetchall()
    assert out == {g: s for g, s in duck}


def test_split_assign_validation(spark):
    from turtle_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(1,)], "grp long")
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(df, "grp", {"train": 0.8, "val": 0.1})
    with pytest.raises(ValueError, match="at least two"):
        split_assign(df, "grp", {"train": 1.0})


def test_leakage_safe_split_clusters_move_together(spark):
    from turtle_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(50)], "doc_id long, text string"
    )
    # two clusters: {0,1,2} -> 0 and {10, 40} -> 10
    cmap = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (40, 10)],
        "doc_id long, canonical_id long",
    )
    out = leakage_safe_split(
        docs, cmap, {"train": 0.5, "val": 0.25, "test": 0.25}
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 50  # left join keeps every doc
    assert {by_id[i]["group_key"] for i in (0, 1, 2)} == {0}
    assert len({by_id[i]["split"] for i in (0, 1, 2)}) == 1
    assert by_id[40]["group_key"] == 10
    assert by_id[40]["split"] == by_id[10]["split"]
    assert by_id[7]["group_key"] == 7  # isolated doc groups to itself


def test_vocabulary_drift_exact_cross_multiplication(spark):
    from turtle_spark.operators.textstats import vocabulary_drift

    old = spark.createDataFrame([("a a b",), ("a c",)], "text string")
    new = spark.createDataFrame([("b b b c",)], "text string")
    out = {r["word"]: r for r in vocabulary_drift(old, new, min_count=1).collect()}
    # T_old=5, T_new=4: a -> |0*5 - 3*4| = 12; b -> |3*5 - 1*4| = 11;
    # c -> |1*5 - 1*4| = 1
    assert out["a"]["drift"] == "12" and (out["a"]["n_old"], out["a"]["n_new"]) == (3, 0)
    assert out["b"]["drift"] == "11"
    assert out["c"]["drift"] == "1"
    # partitioning independence
    out2 = {
        r["word"]: r["drift"]
        for r in vocabulary_drift(old.repartition(5), new.repartition(3), min_count=1).collect()
    }
    assert out2 == {w: r["drift"] for w, r in out.items()}


def test_length_matched_sample_flattens(spark):
    """Every bin downsamples to the smallest bin's size, and the
    report (including exact-selection fingerprints) is identical at 1
    vs 16 partitions."""
    from pyspark.sql import functions as F

    from turtle_spark.operators.sampling import length_matched_sample

    # skewed lengths: quadratic growth concentrates mass in low bins
    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * F.col("id")) % 997).alias("n_chars"),
    )
    rep = length_matched_sample(docs).collect()
    target = min(r["n_before"] for r in rep)
    assert all(r["n_after"] == target for r in rep)
    assert sum(r["n_before"] for r in rep) == 400
    again = length_matched_sample(docs.repartition(16)).collect()
    key = lambda rs: sorted(tuple(r) for r in rs)
    assert key(again) == key(rep)
