"""SHACL-lite validation (operators/shacl.py) on a tiny hand-written
graph: every constraint kind, set semantics over duplicate triples,
and the conformant-graph empty report."""

from __future__ import annotations

import pytest

from turtle_spark.operators.shacl import Shape, validate

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_COLS = "subject string, predicate string, object string, label string, datatype string, objecttype string"


@pytest.fixture(scope="module")
def graph(spark):
    rows = [
        ("p1", _RDF_TYPE, "C", "", "", "iri"),
        ("p1", "name", "Alice", "", "", "literal"),
        ("p1", "name", "Alice", "", "", "literal"),  # duplicate triple
        ("p1", "link", "p2", "", "", "iri"),
        ("p2", _RDF_TYPE, "C", "", "", "iri"),
        ("p2", "name", "Žofie", "", "", "literal"),  # pattern violation
        ("p2", "name", "b2", "en", "", "literal"),  # lang tag: not plain
        ("p2", "name", "b3", "", "", "literal"),
        ("p2", "name", "b4", "", "", "literal"),  # 4 names > maxCount 3
        ("p2", "link", "stranger", "", "", "iri"),  # object untyped
        ("p2", "link", "lit", "", "", "literal"),  # nodeKind violation
        ("p3", _RDF_TYPE, "C", "", "", "iri"),  # no name: minCount
    ]
    return spark.createDataFrame(rows, _COLS)


SHAPES = [
    Shape("s-min", "C", "name", min_count=1),
    Shape("s-max", "C", "name", max_count=3),
    Shape("s-plain", "C", "name", datatype=""),
    Shape("s-pat", "C", "name", pattern="^[A-Za-z]"),
    Shape("s-link", "C", "link", node_kind="iri", object_class="C"),
]


def _report(graph):
    return {
        (r.shape_id, r.constraint, r.focus, r.value)
        for r in validate(graph, SHAPES).collect()
    }


def test_all_constraint_kinds(graph):
    got = _report(graph)
    assert got == {
        ("s-min", "minCount", "p3", None),
        ("s-max", "maxCount", "p2", None),
        ("s-plain", "datatype", "p2", "b2"),
        ("s-pat", "pattern", "p2", "Žofie"),
        # class check: untyped iri AND the literal object both violate
        ("s-link", "class", "p2", "stranger"),
        ("s-link", "class", "p2", "lit"),
        ("s-link", "nodeKind", "p2", "lit"),
    }


def test_duplicates_do_not_double_count(graph, spark):
    # p1 has ONE distinct name; duplicating the triple again must not
    # push it over maxCount 1
    doubled = graph.union(graph)
    rep = validate(doubled, [Shape("m1", "C", "name", max_count=1)])
    assert {(r.constraint, r.focus) for r in rep.collect()} == {
        ("maxCount", "p2")
    }


def test_conformant_graph_empty(spark):
    rows = [
        ("x", _RDF_TYPE, "C", "", "", "iri"),
        ("x", "name", "Ok", "", "", "literal"),
    ]
    g = spark.createDataFrame(rows, _COLS)
    assert validate(g, SHAPES[:4]).count() == 0


def test_empty_shapes_refused(graph):
    with pytest.raises(ValueError, match="no shapes"):
        validate(graph, [])
