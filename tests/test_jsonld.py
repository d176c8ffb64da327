"""JSON-LD node-object lines (turtle_spark.sources.jsonld): layout,
escaping, and the encode->decode round trip."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from turtle_spark.sources.jsonld import read_jsonld_lines, to_jsonld_lines

COLS = (
    "subject string, predicate string, object string, "
    "label string, datatype string, objecttype string"
)

TRIPLES = [
    ("http://x/a", "http://x/p", "hello", "", "", "literal"),
    ("http://x/a", "http://x/p", "bonjour", "fr", "", "literal"),
    ("http://x/a", "http://x/q", "http://x/b", "", "", "iri"),
    ("http://x/a", "http://x/q", "_:bn1", "", "", "iri"),
    ("http://x/b", "http://x/n", "42", "", "<http://www.w3.org/2001/XMLSchema#integer>", "literal"),
    ("http://x/c", "http://x/t", 'quote " slash \\ nl \n tab \t', "", "", "literal"),
]


class TestEncode:
    def test_every_line_is_valid_json(self, spark):
        df = spark.createDataFrame(TRIPLES, COLS)
        for r in to_jsonld_lines(df).collect():
            node = json.loads(r["line"])
            assert node["@id"] == r["subject"]

    def test_expanded_term_shapes(self, spark):
        df = spark.createDataFrame(TRIPLES, COLS)
        lines = {r["subject"]: json.loads(r["line"]) for r in to_jsonld_lines(df).collect()}
        a = lines["http://x/a"]
        assert {"@value": "hello"} in a["http://x/p"]
        assert {"@value": "bonjour", "@language": "fr"} in a["http://x/p"]
        assert {"@id": "http://x/b"} in a["http://x/q"]
        assert {"@id": "_:bn1"} in a["http://x/q"]
        b = lines["http://x/b"]
        assert b["http://x/n"] == [
            {"@value": "42", "@type": "http://www.w3.org/2001/XMLSchema#integer"}
        ]

    def test_deterministic_at_any_parallelism(self, spark):
        df = spark.createDataFrame(TRIPLES, COLS)
        a = sorted(r["line"] for r in to_jsonld_lines(df.repartition(13)).collect())
        b = sorted(r["line"] for r in to_jsonld_lines(df.coalesce(1)).collect())
        assert a == b

    def test_duplicates_collapse(self, spark):
        df1 = spark.createDataFrame(TRIPLES + TRIPLES[:3], COLS)
        df2 = spark.createDataFrame(TRIPLES, COLS)
        assert sorted(r["line"] for r in to_jsonld_lines(df1).collect()) == sorted(
            r["line"] for r in to_jsonld_lines(df2).collect()
        )

    def test_keys_and_values_sorted(self, spark):
        df = spark.createDataFrame(TRIPLES, COLS)
        line = {
            r["subject"]: r["line"] for r in to_jsonld_lines(df).collect()
        }["http://x/a"]
        # predicate keys appear in sorted order in the raw bytes
        assert line.index("http://x/p") < line.index("http://x/q")


class TestRoundTrip:
    def test_encode_decode_identity(self, spark):
        df = spark.createDataFrame(TRIPLES, COLS)
        lines = to_jsonld_lines(df).select("line")
        back = read_jsonld_lines(lines)
        assert sorted(map(tuple, back.collect())) == sorted(TRIPLES)

    def test_decode_tolerates_shorthand(self, spark):
        lines = spark.createDataFrame(
            [('{"@id":"http://x/s","http://x/p":{"@value":"v"}}',)], "line string"
        )
        got = [tuple(r) for r in read_jsonld_lines(lines).collect()]
        assert got == [("http://x/s", "http://x/p", "v", "", "", "literal")]
