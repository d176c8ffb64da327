"""Serializer golden tests.

Layout goldens from graph/graph_test.go:10-53, output-wrapping rules
from graph/sanitize_test.go:9-67, full-document goldens from
marshal_test.go:113-121 and :269-340, plus parse∘serialize∘parse
round-trip fixpoints over the scan fixtures (README.md:107).
"""

from __future__ import annotations

import pytest

from tests.conftest import load_scan_fixtures
from turtle_spark.core.parser import parse_triples
from turtle_spark.core.serializer import GraphBuffer, serialize_triples

# --- graph/graph_test.go -----------------------------------------------------

LAYOUT_CASES = {
    "simple_graph": (
        [("a", "b", "c"), ("c", "d", "e")],
        '<a> <b> "c" .\n<c> <d> "e" .\n',
    ),
    "subject_with_two_predicates": (
        [("a", "b", "c"), ("a", "c", "e")],
        '<a> \n\t<b> "c" ;\n\t<c> "e" .\n',
    ),
    "predicate_with_two_objects": (
        [("a", "b", "c"), ("a", "b", "d")],
        '<a> <b> "c", "d" .\n',
    ),
    "two_predicates_with_two_objects": (
        [("a", "b", "c"), ("a", "b", "d"), ("a", "e", "c"), ("a", "e", "d")],
        '<a> \n\t<b> "c", "d" ;\n\t<e> "c", "d" .\n',
    ),
}


@pytest.mark.parametrize("name", sorted(LAYOUT_CASES))
def test_layout(name: str) -> None:
    triples, expected = LAYOUT_CASES[name]
    g = GraphBuffer()
    for s, p, o in triples:
        g.accept(s, p, o)
    assert g.render() == expected


def test_dedup_on_accept() -> None:
    # graph/graph.go:81-96 — exact duplicates dropped at serialization
    g = GraphBuffer()
    g.accept("a", "b", "c")
    g.accept("a", "b", "c")
    assert g.render() == '<a> <b> "c" .\n'


# --- graph/sanitize_test.go --------------------------------------------------

SANITIZE_CASES = {
    "empty_string": (("", "iri", False), ""),
    "iri": (
        ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "iri", False),
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
    ),
    "blank_node": (("_:b23", "blank", False), "_:b23"),
    "literal": (("this is a literal", "literal", False), '"this is a literal"'),
    "multiline literal": (
        ("this is a\nliteral", "literal", False),
        "'''this is a\nliteral'''",
    ),
    "multiline_literal_apostrophe": (
        ("this is 'a\nliteral", "literal", False),
        '"""this is \'a\nliteral"""',
    ),
    "multiline_literal_quotation": (
        ('this is "a\nliteral', "literal", False),
        "'''this is \"a\nliteral'''",
    ),
    "a, not predicate": (("a", "iri", False), "<a>"),
    "a, predicate": (
        ("a", "iri", True),
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
    ),
}


@pytest.mark.parametrize("name", sorted(SANITIZE_CASES))
def test_output_sanitize(name: str) -> None:
    (s, typ, predicate), expected = SANITIZE_CASES[name]
    assert GraphBuffer()._sanitize(s, typ, predicate) == expected


def test_untyped_object_iri_heuristic() -> None:
    # 3-string accepts classify objects via the URL heuristic
    g = GraphBuffer()
    g.accept("s", "p", "http://example.org/x")
    g.accept("s", "p", "plain text")
    out = g.render()
    assert "<http://example.org/x>" in out
    assert '"plain text"' in out


# --- marshal_test.go goldens -------------------------------------------------

def test_marshal_spiderman_golden() -> None:
    triples = [
        ("http://example.org/green-goblin", "http://www.perceive.net/schemas/relationship/enemyOf", "http://example.org/spiderman"),
        ("http://example.org/green-goblin", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://xmlns.com/foaf/0.1/Person"),
        ("http://example.org/green-goblin", "http://xmlns.com/foaf/0.1/name", "Green Goblin"),
        ("http://example.org/spiderman", "http://www.perceive.net/schemas/relationship/enemyOf", "http://example.org/green-goblin"),
        ("http://example.org/spiderman", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://xmlns.com/foaf/0.1/Person"),
        ("http://example.org/spiderman", "http://xmlns.com/foaf/0.1/name", "Spiderman"),
        ("http://example.org/spiderman", "http://xmlns.com/foaf/0.1/name", "Человек-паук"),
    ]
    expected = (
        "<http://example.org/green-goblin> \n"
        "\t<http://www.perceive.net/schemas/relationship/enemyOf> <http://example.org/spiderman> ;\n"
        "\t<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://xmlns.com/foaf/0.1/Person> ;\n"
        '\t<http://xmlns.com/foaf/0.1/name> "Green Goblin" .\n'
        "<http://example.org/spiderman> \n"
        "\t<http://www.perceive.net/schemas/relationship/enemyOf> <http://example.org/green-goblin> ;\n"
        "\t<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://xmlns.com/foaf/0.1/Person> ;\n"
        '\t<http://xmlns.com/foaf/0.1/name> "Spiderman", "Человек-паук" .\n'
    )
    assert serialize_triples(triples, annotated=False) == expected


def test_marshal_with_base_and_prefix_options() -> None:
    # marshal_test.go:269-313
    out = serialize_triples(
        [("http://example.org/person/Mark_Twain", "http://example.org/relation/author", "http://example.org/books/Huckleberry_Finn")],
        base="http://example.org",
        prefixes={"book": "http://example.org/books/"},
        annotated=False,
    )
    assert out == (
        "@base <http://example.org> .\n"
        "@prefix book: <http://example.org/books/> .\n"
        "</person/Mark_Twain> </relation/author> </books/Huckleberry_Finn> .\n"
    )

    out2 = serialize_triples(
        [("http://example.org/person/Mark_Twain", "http://example.org/relation/author", "http://example.org/books#Huckleberry_Finn")],
        base="http://example.org",
        prefixes={"book": "http://example.org/books#"},
        annotated=False,
    )
    assert out2 == (
        "@base <http://example.org> .\n"
        "@prefix book: <http://example.org/books#> .\n"
        "</person/Mark_Twain> </relation/author> </books#Huckleberry_Finn> .\n"
    )


def test_marshal_subject_equal_to_base() -> None:
    # marshal_test.go:329-340 — subject == base renders <.>
    out = serialize_triples(
        [("http://example.org", "http://example.org/relation/author", "http://example.org/books/Huckleberry_Finn")],
        base="http://example.org",
        annotated=False,
    )
    assert out == "@base <http://example.org> .\n<.> </relation/author> </books/Huckleberry_Finn> .\n"


def test_annotated_objects_render_label_and_datatype() -> None:
    # annotations_test.go:28-97
    out = serialize_triples(
        [
            ("s", "p", "x", "en", "", "literal"),
            ("s", "p", "y", "", "xsd:string", "literal"),
        ]
    )
    assert '"x"@en' in out and '"y"^^xsd:string' in out


# --- round-trip fixpoint -----------------------------------------------------

_CASES = load_scan_fixtures()


def _canon(triples):
    """(s, p, o) content modulo exact duplicates (serializer dedupes).

    The comparison is 3-tuple because the reference itself does not
    round-trip ``objecttype`` for apostrophe-quoted literals: its parse
    side classifies ``'...'`` tokens via the bare-token path as ``iri``
    (scanner/sanitize.go:82-107), so annotation-level equality is lossy
    in the reference too.  Content equality is the invariant it keeps.
    """
    return {(s, p, o) for (s, p, o, *_ann) in triples}


# The reference tags apostrophe-quoted literals as objecttype "iri"
# (bare-token path), so ITS annotated marshal of its own parse output
# would wrap them as broken IRIs.  Annotated round-trip is only
# well-defined outside that quirk; the untyped (3-string) marshal path
# round-trips content for every case via the isIRI heuristic.
_APOSTROPHE_QUIRK = {
    "apostrophe_literal",
    "apostrophe-multiline-literal",
    "escaped-apostrophe",
}


@pytest.mark.parametrize("name", sorted(set(_CASES) - _APOSTROPHE_QUIRK))
def test_roundtrip_annotated(name: str) -> None:
    """parse(serialize(parse(doc))) == parse(doc) modulo dedup (README.md:107)."""
    first = parse_triples(_CASES[name]["turtle"])
    text = serialize_triples(first)
    second = parse_triples(text)
    assert _canon(second) == _canon(first)


@pytest.mark.parametrize("name", sorted(_CASES))
def test_roundtrip_untyped_content(name: str) -> None:
    """3-string marshal (isIRI heuristic) preserves (s,p,o) for all cases."""
    first = parse_triples(_CASES[name]["turtle"])
    text = serialize_triples([t[:3] for t in first], annotated=False)
    second = parse_triples(text)
    assert _canon(second) == _canon(first)


# --- marshal.go:105-116 required-field errors -------------------------------

def test_required_field_errors() -> None:
    """Empty subject/predicate/object raise, checked in that order
    (marshal_test.go:233-256 no_subject/-predicate/-object fixtures)."""
    import pytest as _pytest

    from turtle_spark.core.serializer import (
        NoObjectError,
        NoPredicateError,
        NoSubjectError,
    )

    with _pytest.raises(NoSubjectError):
        GraphBuffer().accept("", "http://e/p", "o")
    with _pytest.raises(NoPredicateError):
        GraphBuffer().accept("http://e/s", "", "o")
    with _pytest.raises(NoObjectError):
        GraphBuffer().accept_annotated("http://e/s", "http://e/p", "")
    # subject outranks predicate outranks object when several are empty
    with _pytest.raises(NoSubjectError):
        GraphBuffer().accept("", "", "")
    with _pytest.raises(NoPredicateError):
        GraphBuffer().accept("s", "", "")
    # a valid triple still renders
    g = GraphBuffer()
    g.accept("a", "b", "c")
    assert g.render() == '<a> <b> "c" .\n'
