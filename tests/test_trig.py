"""TriG source/sink (turtle_spark.sources.trig): literal-aware block
splitting, encode layout, and the encode->decode round trip."""

from __future__ import annotations

from turtle_spark.sources.trig import (
    parse_trig_document,
    split_graph_blocks,
    trig_text,
)

QUAD_COLS = "subject string, predicate string, object string, label string, datatype string, objecttype string, graph string"


class TestSplitGraphBlocks:
    def test_labeled_block_and_directives(self):
        t = '@prefix ex: <http://x/> .\n<urn:g1> {\nex:a ex:b "c" .\n}\n'
        pieces = split_graph_blocks(t)
        assert pieces[0][0] == "" and "@prefix" in pieces[0][1]
        assert pieces[1] == ("<urn:g1>", '\nex:a ex:b "c" .\n')

    def test_graph_keyword_consumed(self):
        t = "GRAPH <urn:g> { <urn:a> <urn:b> <urn:c> . }"
        pieces = split_graph_blocks(t)
        assert pieces[1][0] == "<urn:g>"
        assert "GRAPH" not in pieces[0][1]

    def test_braces_inside_literals_are_data(self):
        t = (
            '<urn:s> <urn:p> "open { not a block" .\n'
            '<urn:g> { <urn:a> <urn:b> "close } not an end" . }\n'
        )
        pieces = split_graph_blocks(t)
        assert len(pieces) == 2  # top + one block
        assert "open {" in pieces[0][1]
        assert "close }" in pieces[1][1]

    def test_braces_inside_comments_and_iris(self):
        t = "# a comment with { braces }\n<urn:s{odd}> { <urn:a> <urn:b> <urn:c> . }\n"
        pieces = split_graph_blocks(t)
        assert pieces[1][0] == "<urn:s{odd}>"

    def test_long_literal_spans_lines(self):
        t = '<urn:g> { <urn:a> <urn:b> """multi\n{line}\n""" . }'
        pieces = split_graph_blocks(t)
        assert len(pieces) == 2 and "{line}" in pieces[1][1]

    def test_unlabeled_block_is_default_graph(self):
        t = "@prefix ex: <http://x/> .\n{ ex:d ex:e ex:f . }\n"
        assert split_graph_blocks(t)[1][0] == ""


class TestParseTrigDocument:
    def test_prefixed_graph_label_expands(self):
        t = "@prefix ex: <http://x/> .\nGRAPH ex:g { ex:a ex:b ex:c . }\n"
        quads = parse_trig_document(t)
        assert quads == [
            ("http://x/a", "http://x/b", "http://x/c", "", "", "iri", "http://x/g")
        ]

    def test_default_graph_triples(self):
        t = '@prefix ex: <http://x/> .\nex:top ex:p "v" .\nex:g { ex:a ex:p ex:c . }\n'
        quads = parse_trig_document(t)
        graphs = {q[6] for q in quads}
        assert graphs == {"", "http://x/g"}

    def test_blank_graph_label_kept(self):
        t = "_:bg { <urn:a> <urn:b> <urn:c> . }"
        assert parse_trig_document(t)[0][6] == "_:bg"


class TestRoundTrip:
    QUADS = [
        ("http://x/a", "http://x/p", "hello", "", "", "literal", "urn:g1"),
        ("http://x/a", "http://x/q", "http://x/b", "", "", "iri", "urn:g1"),
        # no embedded double quote: the serializer would pick the '
        # delimiter, which the reference's own scanner does not read
        # back as a literal (ported quirk, core/sanitize.py:279-287)
        ("http://x/b", "http://x/p", "with {braces} and 'single'", "", "", "literal", "urn:g2"),
        ("http://x/c", "http://x/p", "42", "", "<http://www.w3.org/2001/XMLSchema#integer>", "literal", "urn:g2"),
        ("http://x/d", "http://x/p", "bonjour", "fr", "", "literal", ""),
    ]

    def test_encode_decode_identity(self, spark):
        df = spark.createDataFrame(self.QUADS, QUAD_COLS)
        text = trig_text(df)
        back = parse_trig_document(text)
        assert sorted(back) == sorted(self.QUADS)

    def test_text_deterministic_at_any_parallelism(self, spark):
        df = spark.createDataFrame(self.QUADS, QUAD_COLS)
        assert trig_text(df.repartition(7)) == trig_text(df.coalesce(1))

    def test_default_graph_renders_at_top_level(self, spark):
        df = spark.createDataFrame(self.QUADS, QUAD_COLS)
        text = trig_text(df)
        # the fr literal is outside every block (before the first '{' line)
        top = text.split("{", 1)[0]
        assert "bonjour" in top or "bonjour" in text.rsplit("}", 1)[-1]

    def test_duplicate_quads_collapse(self, spark):
        df = spark.createDataFrame(self.QUADS + self.QUADS[:2], QUAD_COLS)
        assert trig_text(df) == trig_text(spark.createDataFrame(self.QUADS, QUAD_COLS))
