"""DOT export (sources/dot.py): byte rules, escaping, round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from turtle_spark.sources.dot import dot_document, parse_dot_lines, to_dot_lines


def _triples(spark, rows):
    return spark.createDataFrame(
        rows,
        "subject string, predicate string, object string, label string, "
        "datatype string, objecttype string",
    )


def test_dot_lines_format_and_literal_exclusion(spark):
    t = _triples(
        spark,
        [
            ("http://x/a", "http://x/p", "http://x/b", "", "", "iri"),
            ("http://x/a", "http://x/p", "hello", "", "", "literal"),
        ],
    )
    lines = [r["line"] for r in to_dot_lines(t).collect()]
    assert lines == ['  "http://x/a" -> "http://x/b" [label="http://x/p"];']


def test_dot_escaping_round_trips(spark):
    nasty = 'he said "hi" \\ bye'
    t = _triples(spark, [(nasty, "p", 'o"quote', "", "", "iri")])
    lines = to_dot_lines(t)
    back = parse_dot_lines(lines).collect()[0]
    assert back["subject"] == nasty
    assert back["object"] == 'o"quote'
    assert back["predicate"] == "p"


def test_dot_dedups_edges(spark):
    t = _triples(
        spark,
        [
            ("a", "p", "b", "", "", "iri"),
            ("a", "p", "b", "", "", "iri"),
        ],
    )
    assert to_dot_lines(t).count() == 1


def test_dot_document_shape(spark):
    t = _triples(
        spark,
        [("b", "p", "c", "", "", "iri"), ("a", "p", "b", "", "", "iri")],
    )
    doc = dot_document(t, name="g")
    assert doc.startswith('digraph "g" {\n')
    assert doc.endswith("\n}\n")
    body = doc.splitlines()[1:-1]
    assert body == sorted(body)  # bytewise-stable ordering
    assert len(body) == 2


def test_dot_round_trip_on_corpus_sample(spark):
    import __spark_entry__ as em

    t = em._corpus_triples(spark).where(F.col("objecttype") == "iri").limit(200)
    edges = t.select("subject", "predicate", "object").dropDuplicates()
    back = parse_dot_lines(to_dot_lines(
        edges.withColumn("objecttype", F.lit("iri"))
    ))
    a = {tuple(r) for r in edges.collect()}
    b = {(r["subject"], r["predicate"], r["object"]) for r in back.collect()}
    assert a == b
