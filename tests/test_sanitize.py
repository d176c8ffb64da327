"""Sanitizer unit fixtures, parse side (scanner/sanitize_test.go:9-53)."""

from __future__ import annotations

import pytest

from turtle_spark.core.sanitize import sanitize_token

# (input, base) -> (token, label, datatype, objecttype)
CASES = {
    "with-label": (
        ('"this is an English text"@en', ""),
        ("this is an English text", "en", "", "literal"),
    ),
    "with-datatype": (
        ('"this is an English text"^^xsd:string', ""),
        ("this is an English text", "", "xsd:string", "literal"),
    ),
    "at-in-literal": (
        ('"my email is x@y.com"^^xsd:string', ""),
        ("my email is x@y.com", "", "xsd:string", "literal"),
    ),
    "multiline-literal-datatype": (
        (
            '"""Note that SI supports only the use of symbols and deprecates'
            ' the use of any abbreviations for units."""^^qudt:LatexString',
            "",
        ),
        (
            "Note that SI supports only the use of symbols and deprecates"
            " the use of any abbreviations for units.",
            "",
            "qudt:LatexString",
            "literal",
        ),
    ),
    "multiline-literal-label": (
        ('"""Ostrouhej čtyři sta brambor, dokud můžeš ostrou škrabkou!"""@cs', ""),
        ("Ostrouhej čtyři sta brambor, dokud můžeš ostrou škrabkou!", "cs", "", "literal"),
    ),
    "iri": (
        ("</path>", "http://example.org/"),
        ("http://example.org/path", "", "", "iri"),
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_sanitize(name: str) -> None:
    (token, base), expected = CASES[name]
    assert sanitize_token(token, base, {}) == expected


def test_rdf_type_shorthand_only_for_bare_a() -> None:
    token, _, _, typ = sanitize_token("a", "", {})
    assert token == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert typ == "iri"
    # quoted 'a' stays a literal
    assert sanitize_token('"a"', "", {})[0] == "a"


def test_bare_numeric_annotation_not_split() -> None:
    # scanner_test.go:1332 — quirk: ^^ embedded in a bare numeric stays
    token, label, datatype, typ = sanitize_token("1.0E0^^xsd::float", "", {})
    assert (token, label, datatype, typ) == ("1.0E0^^xsd::float", "", "", "literal")


def test_plus_prefixed_numeric_classifies_iri_but_passes_through() -> None:
    # scanner_test.go:1337
    token, _, _, typ = sanitize_token("+.3e+2", "", {})
    assert (token, typ) == ("+.3e+2", "iri")


def test_trailing_gt_trimmed_without_lt() -> None:
    # trim table pair {"", ">"} — scanner/sanitize.go:130-133
    assert sanitize_token("foo>", "", {})[0] == "foo"


def test_mailto_iri_kept_without_base() -> None:
    token, _, _, typ = sanitize_token("<mailto:timbl@w3.org>", "", {})
    assert (token, typ) == ("mailto:timbl@w3.org", "iri")


def test_base_trailing_slash_preserved_on_identity_join() -> None:
    # unmarshal_test.go:173-185 — <.> resolves to the base verbatim
    assert sanitize_token("<.>", "http://example.org", {})[0] == "http://example.org"
    assert sanitize_token("</>", "http://example.org/", {})[0] == "http://example.org/"
