"""N-Triples source/sink (sources/ntriples.py): escape rules, line
grammar, blank-node renaming, write/read round-trip, and the
no-Python encode plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turtle_spark.sources.ntriples import (
    parse_nt_line,
    read_ntriples,
    to_ntriples,
    write_ntriples,
)

_COLS = "subject string, predicate string, object string, label string, datatype string, objecttype string"


def test_line_rendering(spark):
    rows = [
        ("http://x/s", "http://x/p", "http://x/o", "", "", "iri"),
        ("http://x/s", "http://x/p", 'tab\t "q" \\ nl\n', "", "", "literal"),
        ("http://x/s", "http://x/p", "hi", "en", "", "literal"),
        ("http://x/s", "http://x/p", "5", "", "http://www.w3.org/2001/XMLSchema#integer", "literal"),
        ("_:doc-1#b0", "http://x/p", "_:doc-1#b1", "", "", "iri"),
    ]
    lines = sorted(
        r.line
        for r in to_ntriples(spark.createDataFrame(rows, _COLS)).collect()
    )
    assert "<http://x/s> <http://x/p> <http://x/o> ." in lines
    assert (
        '<http://x/s> <http://x/p> "tab\\t \\"q\\" \\\\ nl\\n" .' in lines
    )
    assert '<http://x/s> <http://x/p> "hi"@en .' in lines
    assert (
        '<http://x/s> <http://x/p> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .'
        in lines
    )
    bn = [l for l in lines if l.startswith("_:b")]
    assert len(bn) == 1 and " <http://x/p> _:b" in bn[0]


def test_parse_nt_line():
    assert parse_nt_line("<http://x/s> <http://x/p> <http://x/o> .") == (
        "http://x/s", "http://x/p", "http://x/o", "", "", "iri"
    )
    assert parse_nt_line('<s:a> <p:b> "v\\n\\"w\\\\" .') == (
        "s:a", "p:b", 'v\n"w\\', "", "", "literal"
    )
    assert parse_nt_line('<s:a> <p:b> "x"@cs .') == (
        "s:a", "p:b", "x", "cs", "", "literal"
    )
    assert parse_nt_line('<s:a> <p:b> "1"^^<d:t> .') == (
        "s:a", "p:b", "1", "", "d:t", "literal"
    )
    assert parse_nt_line("_:b1 <p:b> _:b2 .") == (
        "_:b1", "p:b", "_:b2", "", "", "iri"
    )
    assert parse_nt_line("") is None
    assert parse_nt_line("# comment") is None
    with pytest.raises(ValueError, match="malformed"):
        parse_nt_line("<unterminated .")


def test_roundtrip(spark, tmp_path):
    rows = [
        ("http://x/s", "http://x/p", 'weird\t"lit"\\', "", "", "literal"),
        ("http://x/s", "http://x/q", "v", "en", "", "literal"),
        ("http://x/s", "http://x/q", "7", "", "d:int", "literal"),
        ("_:doc#b0", "http://x/p", "http://x/s", "", "", "iri"),
        ("http://x/s", "http://x/r", "_:doc#b0", "", "", "iri"),
    ]
    df = spark.createDataFrame(rows, _COLS)
    path = str(tmp_path / "dump.nt")
    write_ntriples(df, path)
    back = read_ntriples(spark, path)

    # blank labels are deterministically renamed on write; apply the
    # same rename to the source and compare exact sets
    renamed = df.select(
        *[
            F.when(
                F.col(c).startswith("_:"), F.concat(F.lit("_:b"), F.md5(F.col(c)))
            )
            .otherwise(F.col(c))
            .alias(c)
            if c in ("subject", "object")
            else F.col(c)
            for c in df.columns
        ]
    )
    # the rename applies to object only for iri rows; literal "_:"-
    # prefixed strings would be left alone by the writer (quoted path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, renamed.collect())
    )


def test_escape_roundtrip_hypothesis():
    """Property: any literal value survives encode -> parse.  Pure
    Python mirror of the column escape chain (same order), fuzzing
    the parser's literal grammar with adversarial content."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def esc(s: str) -> str:
        return (
            s.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )

    # printable-ish unicode plus the escape-relevant controls
    literal = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # no lone surrogates
        ),
        max_size=80,
    )

    @given(literal)
    @settings(max_examples=300, deadline=None)
    def check(value: str) -> None:
        line = f'<s:x> <p:y> "{esc(value)}" .'
        parsed = parse_nt_line(line)
        # values containing raw LF/CR would break the one-line format,
        # but esc() removed them, so the parse must always succeed
        assert parsed is not None or value.strip() == ""
        if parsed is not None:
            assert parsed[2] == value
            assert parsed[5] == "literal"

    check()


def test_encode_has_no_python(spark):
    df = spark.createDataFrame(
        [("s", "p", "o", "", "", "iri")], _COLS
    )
    plan = to_ntriples(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
