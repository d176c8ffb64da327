"""N-Quads source/sink (sources/nquads.py) and SPARQL GRAPH scoping
(operators/bgp.py / sparql.py): line grammar, round-trips, default
graph, and the same-graph join semantics GRAPH ?g buys."""

from __future__ import annotations

import pytest

from turtle_spark.operators.sparql import sparql_select
from turtle_spark.sources.nquads import (
    parse_nq_line,
    read_nquads,
    to_nquads,
    write_nquads,
)

_QCOLS = (
    "subject string, predicate string, object string, label string, "
    "datatype string, objecttype string, graph string"
)


@pytest.fixture(scope="module")
def quads(spark):
    rows = [
        # e/a is typed AND linked in g1; in g2 it is linked but NOT typed
        ("e/a", "rdf/type", "c/Person", "", "", "iri", "g/1"),
        ("e/a", "p/knows", "e/b", "", "", "iri", "g/1"),
        ("e/a", "p/knows", "e/c", "", "", "iri", "g/2"),
        ("e/b", "rdf/type", "c/Person", "", "", "iri", "g/2"),
        ("e/b", "p/name", "Bo\tBob", "", "", "literal", "g/2"),
        ("_:x", "p/note", "hi", "en", "", "literal", ""),  # default graph
        ("e/c", "p/age", "3", "", "http://x/int", "literal", "g/1"),
    ]
    return spark.createDataFrame(rows, _QCOLS)


def test_graph_variable_scopes_join(quads):
    # typed subject with a link IN THE SAME graph: only (e/a, g/1)
    # qualifies — e/a's g/2 link has no g/2 type, e/b's g/2 type has
    # no g/2 link
    out = sparql_select(
        quads,
        patterns=[("?s", "rdf/type", "?t", "iri"), ("?s", "p/knows", "?o", "iri")],
        graph="?g",
    ).collect()
    assert [(r["g"], r["s"], r["o"]) for r in out] == [("g/1", "e/a", "e/b")]


def test_graph_none_is_merged_union(quads):
    # without GRAPH the same BGP joins across documents (merged graph)
    out = sparql_select(
        quads,
        patterns=[("?s", "rdf/type", "?t", "iri"), ("?s", "p/knows", "?o", "iri")],
    )
    # e/a (typed in g/1) joins links from BOTH graphs; e/b has no link
    got = sorted((r["s"], r["o"]) for r in out.collect())
    assert got == [("e/a", "e/b"), ("e/a", "e/c")]


def test_graph_constant_prunes(quads):
    out = sparql_select(
        quads, patterns=[("?s", "p/knows", "?o", "iri")], graph="g/2"
    )
    assert [(r["s"], r["o"]) for r in out.collect()] == [("e/a", "e/c")]


def test_graph_scopes_optional(quads):
    # OPTIONAL under GRAPH ?g must match in the SAME graph: e/a's type
    # in g/1 pairs with the g/1 link; the g/2 link row gets NULL type
    out = sparql_select(
        quads,
        patterns=[("?s", "p/knows", "?o", "iri")],
        optionals=[[("?s", "rdf/type", "?t", "iri")]],
        graph="?g",
    )
    got = sorted((r["g"], r["o"], r["t"]) for r in out.collect())
    assert got == [("g/1", "e/b", "c/Person"), ("g/2", "e/c", None)]


def test_graph_scopes_not_exists(quads):
    # subjects with a link but NO type in the same graph
    out = sparql_select(
        quads,
        patterns=[("?s", "p/knows", "?o", "iri")],
        not_exists=[[("?s", "rdf/type", "?t", "iri")]],
        graph="?g",
    )
    assert [(r["g"], r["s"]) for r in out.collect()] == [("g/2", "e/a")]


def test_nquads_lines(quads):
    lines = {r["line"] for r in to_nquads(quads).collect()}
    assert "<e/a> <p/knows> <e/b> <g/1> ." in lines
    assert '<e/c> <p/age> "3"^^<http://x/int> <g/1> .' in lines
    assert '<e/b> <p/name> "Bo\\tBob" <g/2> .' in lines
    # default-graph row renders as a 3-term line, blank renamed
    assert any(l.endswith('"hi"@en .') and " <g/" not in l for l in lines)


def test_nquads_round_trip(spark, quads, tmp_path):
    path = str(tmp_path / "dump.nq")
    write_nquads(quads, path)
    back = read_nquads(spark, path)
    want = {tuple(r) for r in quads.collect() if not r["subject"].startswith("_:")}
    got = {tuple(r) for r in back.collect() if not r["subject"].startswith("_:b")}
    assert got == want
    # the blank-subject row survives with a stable renamed label
    bn = [r for r in back.collect() if r["subject"].startswith("_:b")]
    assert len(bn) == 1 and bn[0]["object"] == "hi" and bn[0]["graph"] == ""


def test_parse_nq_line_grammar():
    assert parse_nq_line("# comment") is None
    assert parse_nq_line("   ") is None
    t = parse_nq_line('<s> <p> "v\\n"@en <g> .')
    assert t == ("s", "p", "v\n", "en", "", "literal", "g")
    t = parse_nq_line("_:b1 <p> _:b2 .")
    assert t == ("_:b1", "p", "_:b2", "", "", "iri", "")
    with pytest.raises(ValueError, match="malformed"):
        parse_nq_line("<s> <p> .")
