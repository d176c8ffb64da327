"""Unit tests for the bitemporal triple layer
(operators/temporal_kg.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from turtle_spark.operators.temporal_kg import (
    TRIPLE_KEY,
    as_of,
    coalesce_intervals,
    synth_history,
    temporal_delta,
)

HIST_COLS = (
    "subject string, predicate string, object string, label string, "
    "datatype string, objecttype string, valid_from long, valid_to long"
)


def _hist(spark, intervals, key=("s", "p", "o", "", "", "literal")):
    return spark.createDataFrame(
        [key + iv for iv in intervals], HIST_COLS
    )


def _ivs(df):
    return sorted((r.valid_from, r.valid_to) for r in df.collect())


def test_coalesce_merges_overlap_and_adjacent(spark):
    out = _ivs(coalesce_intervals(_hist(spark, [(0, 5), (3, 9), (9, 12)])))
    assert out == [(0, 12)]


def test_coalesce_keeps_gaps(spark):
    out = _ivs(coalesce_intervals(_hist(spark, [(0, 5), (6, 9)])))
    assert out == [(0, 5), (6, 9)]


def test_coalesce_contained_interval_absorbed(spark):
    out = _ivs(coalesce_intervals(_hist(spark, [(0, 10), (2, 4), (12, 13)])))
    assert out == [(0, 10), (12, 13)]


def test_coalesce_is_per_triple_not_global(spark):
    a = _hist(spark, [(0, 5)], key=("s1", "p", "o", "", "", "literal"))
    b = _hist(spark, [(4, 9)], key=("s2", "p", "o", "", "", "literal"))
    out = coalesce_intervals(a.unionByName(b))
    # different triples never merge even with overlapping windows
    assert out.count() == 2


def test_as_of_half_open_semantics(spark):
    h = _hist(spark, [(0, 5)])
    assert as_of(h, 0).count() == 1
    assert as_of(h, 4).count() == 1
    assert as_of(h, 5).count() == 0  # valid_to is exclusive


def test_temporal_delta_detects_assert_and_retract(spark):
    # triple A alive only early, triple B alive only late
    a = _hist(spark, [(0, 10)], key=("sa", "p", "oa", "", "", "literal"))
    b = _hist(spark, [(20, 30)], key=("sb", "p", "ob", "", "", "literal"))
    d = temporal_delta(a.unionByName(b), 5, 25).collect()
    assert len(d) == 1
    row = d[0]
    assert row.predicate == "p" and row.n_added == 1 and row.n_removed == 1


def test_synth_history_deterministic_and_parallelism_independent(spark):
    t = spark.createDataFrame(
        [
            ("http://x/s%d" % i, "http://x/p", "o%d" % i, "", "", "literal")
            for i in range(50)
        ],
        ", ".join(f"{c} string" for c in TRIPLE_KEY),
    )
    h1 = synth_history(t).orderBy(*TRIPLE_KEY, "valid_from").collect()
    h2 = (
        synth_history(t.repartition(7))
        .orderBy(*TRIPLE_KEY, "valid_from")
        .collect()
    )
    assert h1 == h2
    # every interval is well-formed and versions are 1000-tick spaced
    for r in h1:
        assert r.valid_to > r.valid_from
        assert 0 <= r.valid_from % 1000 < 400


def test_end_to_end_counts_match_python_merge(spark):
    t = spark.createDataFrame(
        [("http://x/s%d" % i, "http://x/p", "o", "", "", "literal") for i in range(20)],
        ", ".join(f"{c} string" for c in TRIPLE_KEY),
    )
    raw = synth_history(t)
    rows = [
        ((r.subject, r.predicate, r.object, r.label, r.datatype, r.objecttype),
         (r.valid_from, r.valid_to))
        for r in raw.collect()
    ]
    byk = {}
    for k, iv in rows:
        byk.setdefault(k, []).append(iv)
    expect = 0
    for ivs in byk.values():
        merged = []
        for s, e in sorted(ivs):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        expect += len(merged)
    assert coalesce_intervals(raw).count() == expect
