"""Deterministic label propagation (operators/communities.py):
community separation, tie-break rule, and partitioning-independence."""

from __future__ import annotations

import pytest

from turtle_spark.operators.communities import label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_two_cliques_with_bridge(spark):
    # two K4 cliques joined by one bridge edge: LPA keeps them as two
    # communities (CC would merge them into one).  Triangles are too
    # small — min-label tie-breaks flood the bridge — so the test uses
    # cliques where frequency dominates the tie-break.
    import itertools

    a = [f"a{i}" for i in range(1, 5)]
    b = [f"b{i}" for i in range(1, 5)]
    pairs = (
        list(itertools.combinations(a, 2))
        + list(itertools.combinations(b, 2))
        + [("a1", "b1")]
    )
    labels = {r.node: r.label for r in label_propagation(_edges(spark, pairs), rounds=4).collect()}
    assert len({labels[n] for n in a}) == 1
    assert len({labels[n] for n in b}) == 1
    assert labels["a1"] != labels["b1"]


def test_tie_breaks_to_smallest_label(spark):
    # star: center 'm' has neighbors with distinct labels -> after
    # round 1 it adopts the smallest neighbor label
    pairs = [("m", "x"), ("m", "y"), ("m", "b")]
    labels = {r.node: r.label for r in label_propagation(_edges(spark, pairs), rounds=1).collect()}
    assert labels["m"] == "b"
    # leaves see only the center: they all adopt its initial label
    assert labels["x"] == labels["y"] == labels["b"] == "m"


def test_partitioning_independent(spark):
    pairs = [(f"n{i}", f"n{(i * 5 + 2) % 13}") for i in range(13)]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, label_propagation(e, rounds=4).collect()))
    b = sorted(
        map(tuple, label_propagation(e.repartition(7, "src"), rounds=4).collect())
    )
    assert a == b


def test_rounds_validated(spark):
    with pytest.raises(ValueError, match="rounds"):
        label_propagation(_edges(spark, [("a", "b")]), rounds=0)
