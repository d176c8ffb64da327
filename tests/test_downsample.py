"""lttb_downsample: parallel LTTB (bucket-mean anchors) semantics.

The driver query `q_events_lttb` is additionally pinned hash-exact
against a full DuckDB SQL twin by test_oracle_parity.py; these tests
check the operator's promises on hand-built series where the expected
answer is checkable by eye.
"""

from __future__ import annotations

import datetime as dt

from turtle_spark.operators.downsample import lttb_downsample


def _series(spark, points, event_type="a"):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=int(t)), event_type, float(v))
        for i, (t, v) in enumerate(points)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_endpoints_always_survive(spark):
    pts = [(i * 10, 1.0) for i in range(50)]
    df = _series(spark, pts)
    out = lttb_downsample(df, n_out=10).orderBy("bucket").collect()
    assert len(out) == 10
    assert out[0]["event_id"] == 0 and out[0]["bucket"] == 0
    assert out[-1]["event_id"] == 49 and out[-1]["bucket"] == 9


def test_peak_is_kept(spark):
    # flat series with one spike in the middle: the spike's bucket must
    # select the spike (it maximizes the triangle area vs flat anchors)
    pts = [(i * 10, 1.0) for i in range(50)]
    pts[25] = (250, 100.0)
    df = _series(spark, pts)
    out = lttb_downsample(df, n_out=10).collect()
    assert any(r["event_id"] == 25 for r in out)
    assert any(r["v_fixed"] == 100_000 for r in out)


def test_short_series_passes_through(spark):
    pts = [(i, float(i)) for i in range(7)]
    df = _series(spark, pts)
    out = lttb_downsample(df, n_out=10).orderBy("bucket").collect()
    assert [r["event_id"] for r in out] == list(range(7))


def test_multiple_series_independent(spark):
    a = [(i * 10, 1.0) for i in range(40)]
    b = [(i * 5, float(i % 7)) for i in range(30)]
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=t), "a", v) for i, (t, v) in enumerate(a)
    ] + [
        (1000 + i, base + dt.timedelta(seconds=t), "b", v)
        for i, (t, v) in enumerate(b)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = lttb_downsample(df, n_out=8).collect()
    assert sum(1 for r in out if r["event_type"] == "a") == 8
    assert sum(1 for r in out if r["event_type"] == "b") == 8


def test_partition_invariance(spark):
    # the integer-exact design promises bit-identical selection at any
    # parallelism: 1 partition vs 8 must agree row-for-row
    pts = [(i * 3, float((i * 7919) % 101)) for i in range(200)]
    df = _series(spark, pts)
    sel1 = sorted(
        (r["bucket"], r["event_id"], r["v_fixed"])
        for r in lttb_downsample(df.coalesce(1), n_out=20).collect()
    )
    sel8 = sorted(
        (r["bucket"], r["event_id"], r["v_fixed"])
        for r in lttb_downsample(df.repartition(8), n_out=20).collect()
    )
    assert sel1 == sel8
    assert len(sel1) == 20
