"""SPARQL property-path evaluation (operators/paths.py).

Ground truths are tiny hand-checkable graphs plus a brute-force
Python BFS evaluator — an independent algorithm (per-source search
over dicts) from the engine's join/closure composition.
"""

from __future__ import annotations

import pytest

from turtle_spark.operators.paths import (
    Alt,
    Inv,
    OneOrMore,
    P,
    Seq,
    ZeroOrMore,
    ZeroOrOne,
    parse_path,
    path_query,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _triples_df(spark, rows):
    """rows: (s, p, o) — objecttype derived as 'iri' unless o startswith '\"'."""
    data = [
        (s, p, o, "", "", "literal" if o.startswith('"') else "iri")
        for s, p, o in rows
    ]
    return spark.createDataFrame(
        data, "subject string, predicate string, object string, "
        "label string, datatype string, objecttype string"
    )


def _pairs(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


GRAPH = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("c", "knows", "a"),  # 3-cycle
    ("a", "likes", "d"),
    ("d", "name", '"dee"'),
    ("b", RDF_TYPE, "Person"),
]


def test_single_step_and_inverse(spark):
    t = _triples_df(spark, GRAPH)
    assert _pairs(path_query(t, P("knows"))) == {("a", "b"), ("b", "c"), ("c", "a")}
    assert _pairs(path_query(t, Inv(P("knows")))) == {
        ("b", "a"),
        ("c", "b"),
        ("a", "c"),
    }


def test_seq_and_alt(spark):
    t = _triples_df(spark, GRAPH)
    # knows/knows: two hops around the cycle
    assert _pairs(path_query(t, Seq(P("knows"), P("knows")))) == {
        ("a", "c"),
        ("b", "a"),
        ("c", "b"),
    }
    # knows|likes
    assert _pairs(path_query(t, Alt(P("knows"), P("likes")))) == {
        ("a", "b"),
        ("b", "c"),
        ("c", "a"),
        ("a", "d"),
    }
    # seq ending in a literal-valued predicate
    assert _pairs(path_query(t, Seq(P("likes"), P("name")))) == {("a", '"dee"')}


def test_one_or_more_on_cycle_includes_self_pairs(spark):
    t = _triples_df(spark, GRAPH)
    got = _pairs(path_query(t, OneOrMore(P("knows"))))
    # every node of the 3-cycle reaches every node including itself
    assert got == {(x, y) for x in "abc" for y in "abc"}


def test_zero_or_more_identity_covers_all_graph_terms(spark):
    t = _triples_df(spark, GRAPH)
    got = _pairs(path_query(t, ZeroOrMore(P("likes"))))
    terms = {s for s, _, _ in GRAPH} | {o for _, _, o in GRAPH}
    assert got == {(x, x) for x in terms} | {("a", "d")}


def test_zero_or_one(spark):
    t = _triples_df(spark, GRAPH)
    got = _pairs(path_query(t, ZeroOrOne(P("likes"))))
    terms = {s for s, _, _ in GRAPH} | {o for _, _, o in GRAPH}
    assert got == {(x, x) for x in terms} | {("a", "d")}


def test_collection_membership_path(spark):
    """rdf:rest*/rdf:first — the canonical SPARQL list-membership
    path — over a 3-element collection spine."""
    first = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
    rest = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
    nil = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
    t = _triples_df(
        spark,
        [
            ("_:b0", first, "x"),
            ("_:b0", rest, "_:b1"),
            ("_:b1", first, "y"),
            ("_:b1", rest, "_:b2"),
            ("_:b2", first, "z"),
            ("_:b2", rest, nil),
        ],
    )
    got = _pairs(path_query(t, f"<{rest}>*/<{first}>"))
    # head reaches all members; each tail cell reaches its suffix
    assert got == {
        ("_:b0", "x"),
        ("_:b0", "y"),
        ("_:b0", "z"),
        ("_:b1", "y"),
        ("_:b1", "z"),
        ("_:b2", "z"),
    }


def test_parse_path_grammar():
    assert parse_path("<http://x/p>") == P("http://x/p")
    assert parse_path("a") == P(RDF_TYPE)
    assert parse_path("^<p>") == Inv(P("p"))
    assert parse_path("<p>/<q>") == Seq(P("p"), P("q"))
    assert parse_path("<p>|<q>") == Alt(P("p"), P("q"))
    assert parse_path("<p>+") == OneOrMore(P("p"))
    assert parse_path("<p>*") == ZeroOrMore(P("p"))
    assert parse_path("<p>?") == ZeroOrOne(P("p"))
    # precedence: / binds tighter than |, postfix tighter than both,
    # ^ applies to the next unary
    assert parse_path("<p>/<q>|<r>") == Alt(Seq(P("p"), P("q")), P("r"))
    assert parse_path("(<p>|<q>)+/a") == Seq(
        OneOrMore(Alt(P("p"), P("q"))), P(RDF_TYPE)
    )
    assert parse_path("^<p>+") == Inv(OneOrMore(P("p")))
    assert parse_path("(^<p>)+") == OneOrMore(Inv(P("p")))


@pytest.mark.parametrize("bad", ["", "<p", "<p>)", "(<p>", "<p>//<q>", "b", "<p> <q>"])
def test_parse_path_rejects(bad):
    with pytest.raises(ValueError):
        parse_path(bad)


def test_string_and_tree_forms_agree(spark):
    t = _triples_df(spark, GRAPH)
    s = _pairs(path_query(t, "(<knows>|<likes>)+"))
    e = _pairs(path_query(t, OneOrMore(Alt(P("knows"), P("likes")))))
    assert s == e and ("a", "d") in s


def test_brute_force_differential(spark):
    """Random-ish deterministic graph: engine pairs == per-source BFS
    over the same path, for a composite expression."""
    import itertools

    rows = []
    nodes = [f"n{i}" for i in range(12)]
    for i, j in itertools.product(range(12), range(12)):
        if i != j and (i * 7 + j * 3) % 11 == 0:
            rows.append((nodes[i], "p", nodes[j]))
        if i != j and (i * 5 + j) % 13 == 0:
            rows.append((nodes[i], "q", nodes[j]))
    t = _triples_df(spark, rows)
    got = _pairs(path_query(t, "(<p>/<q>)+"))

    # independent: materialize p-then-q composite edges, then BFS
    padj: dict[str, set] = {}
    qadj: dict[str, set] = {}
    for s, p, o in rows:
        (padj if p == "p" else qadj).setdefault(s, set()).add(o)
    comp: dict[str, set] = {}
    for s, mids in padj.items():
        for m in mids:
            for o in qadj.get(m, ()):
                comp.setdefault(s, set()).add(o)
    expect = set()
    for src in comp:
        seen: set[str] = set()
        stack = list(comp[src])
        while stack:
            v = stack.pop()
            if v not in seen:
                seen.add(v)
                stack.extend(comp.get(v, ()))
        expect |= {(src, d) for d in seen}
    assert got == expect


def test_negated_property_set(spark):
    from turtle_spark.operators.paths import NegatedSet

    t = _triples_df(spark, GRAPH)
    # forward: every edge whose predicate is not 'knows'
    got = _pairs(path_query(t, "!<knows>"))
    assert got == {("a", "d"), ("d", '"dee"'), ("b", "Person")}
    # 'a' inside the set
    assert _pairs(path_query(t, "!(<knows>|a)")) == {
        ("a", "d"), ("d", '"dee"'),
    }
    # inverse-only member: reversed edges with predicate not 'name'
    assert _pairs(path_query(t, "!(^<name>)")) == {
        ("b", "a"), ("c", "b"), ("a", "c"), ("d", "a"), ("Person", "b"),
    }
    # mixed set = union of the two branches (spec split)
    mixed = _pairs(path_query(t, "!(<knows>|<likes>|a|^<knows>|^<name>|^" + "<" + RDF_TYPE + ">)"))
    assert mixed == {("d", '"dee"'), ("d", "a")}
    # parse tree shape
    assert parse_path("!(<p>|^<q>)") == NegatedSet(fwd=("p",), inv=("q",))
    # within a sequence: friends' non-knows attributes
    assert _pairs(path_query(t, "<knows>/!(<knows>|a)")) == {("c", "d")}
    with pytest.raises(ValueError):
        parse_path("!(<p>|<q)")
    with pytest.raises(ValueError):
        parse_path("!+")
