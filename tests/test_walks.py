"""Random-walk corpus generation (operators/walks.py): structure,
edge-validity, determinism across partitioning, and directed
dead-end early stop."""

from __future__ import annotations

from pyspark.sql import functions as F

from turtle_spark.operators.walks import random_walks


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_walk_structure_and_edges(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    edges = _edges(spark, pairs)
    walks = random_walks(edges, walk_length=6, walks_per_node=2).collect()
    und = set(pairs) | {(b, a) for a, b in pairs}

    by_walk: dict[str, dict[int, str]] = {}
    for r in walks:
        by_walk.setdefault(r.walk_id, {})[r.pos] = r.node
    # 4 nodes x 2 walks, each complete (undirected graph has no dead end)
    assert len(by_walk) == 8
    for wid, posmap in by_walk.items():
        assert sorted(posmap) == list(range(6))
        start = wid.rsplit("#w", 1)[0]
        assert posmap[0] == start
        for i in range(1, 6):
            assert (posmap[i - 1], posmap[i]) in und  # every hop is an edge


def test_deterministic_across_partitioning(spark):
    pairs = [(f"n{i}", f"n{(i * 3 + 1) % 11}") for i in range(11)]
    edges = _edges(spark, pairs)
    a = random_walks(edges, walk_length=5, walks_per_node=1)
    b = random_walks(edges.repartition(7, "dst"), walk_length=5, walks_per_node=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_directed_dead_end_stops_early(spark):
    edges = _edges(spark, [("a", "b"), ("b", "c")])  # c is a sink
    walks = random_walks(
        edges, walk_length=5, walks_per_node=1, undirected=False
    )
    rows = walks.where(F.col("walk_id") == "a#w0").collect()
    # a -> b -> c then stops: positions 0,1,2 only
    assert sorted(r.pos for r in rows) == [0, 1, 2]
    assert {r.pos: r.node for r in rows} == {0: "a", 1: "b", 2: "c"}


def test_explicit_starts(spark):
    edges = _edges(spark, [("a", "b"), ("b", "c")])
    starts = spark.createDataFrame([("b",)], "e string")
    walks = random_walks(edges, walk_length=3, walks_per_node=2, starts=starts)
    assert set(r.start for r in walks.collect()) == {"b"}
