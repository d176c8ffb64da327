"""N-Quads source/sink — the named-graph counterpart of
``sources/ntriples.py``.

N-Quads (RDF 1.1, W3C REC) is N-Triples plus an optional fourth graph
term before the terminating dot; a 3-term line belongs to the default
graph.  Like NT it is line-regular — the one RDF serialization family
that splits at arbitrary byte boundaries, which is why it is the bulk
exchange format for provenance-carrying triple dumps at 100 TB (the
Turtle the reference parses cannot be split mid-document;
``/root/reference/scanner/scanner.go`` keeps cross-line state).

Encode is the same pure column replace/concat chain as the NT sink —
codegen end to end, mirrored exactly in DuckDB; decode extends the NT
regular grammar with the optional graph group and runs one Python call
per Arrow batch of lines.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from turtle_spark.sources.ntriples import (
    TRIPLE_SCHEMA,
    _escape,
    _node,
    _unescape,
)

__all__ = ["QUAD_SCHEMA", "parse_nq_line", "read_nquads", "to_nquads", "write_nquads"]

QUAD_SCHEMA = T.StructType(
    list(TRIPLE_SCHEMA.fields) + [T.StructField("graph", T.StringType())]
)

_NQ_LINE_RE = re.compile(
    r"^\s*"
    r"(<(?P<siri>[^>]*)>|(?P<sbn>_:\S+))\s+"
    r"<(?P<p>[^>]*)>\s+"
    r"(<(?P<oiri>[^>]*)>"
    r"|(?P<obn>_:\S+)"
    r'|"(?P<olit>(?:[^"\\]|\\.)*)"'
    r"(?:@(?P<lang>[A-Za-z0-9-]+)|\^\^<(?P<dt>[^>]*)>)?)"
    r"(?:\s+(<(?P<giri>[^>]*)>|(?P<gbn>_:\S+)))?"
    r"\s*\.\s*$"
)


def _object_term() -> Column:
    lit = F.concat(
        F.lit('"'),
        _escape(F.col("object")),
        F.lit('"'),
        F.when(
            F.col("label") != "", F.concat(F.lit("@"), F.col("label"))
        ).otherwise(
            F.when(
                F.col("datatype") != "",
                F.concat(F.lit("^^<"), F.col("datatype"), F.lit(">")),
            ).otherwise(F.lit(""))
        ),
    )
    return F.when(F.col("objecttype") == "literal", lit).otherwise(
        _node(F.col("object"))
    )


def to_nquads(quads: DataFrame) -> DataFrame:
    """Render the wide quad table to one ``line`` column of canonical
    N-Quads.  A NULL or empty ``graph`` renders a 3-term line (the
    default graph, per the spec)."""
    graph_term = F.when(
        F.col("graph").isNotNull() & (F.col("graph") != ""),
        F.concat(F.lit(" "), _node(F.col("graph"))),
    ).otherwise(F.lit(""))
    line = F.concat(
        _node(F.col("subject")),
        F.lit(" "),
        F.concat(F.lit("<"), F.col("predicate"), F.lit(">")),
        F.lit(" "),
        _object_term(),
        graph_term,
        F.lit(" ."),
    )
    return quads.select(line.alias("line"))


def write_nquads(quads: DataFrame, path: str) -> None:
    """Export the quad table as an N-Quads dump — one UTF-8 text
    part-file per partition, line-splittable on read at any scale.
    Repartitioning by ``graph`` first gives graph-clustered parts
    (cheap downstream per-graph reads); callers choose."""
    to_nquads(quads).write.mode("overwrite").text(path)


def parse_nq_line(line: str) -> tuple | None:
    """One N-Quads line -> wide-schema tuple (graph '' for the default
    graph), None for blank/comment lines; ValueError on malformed."""
    stripped = line.strip()
    if not stripped or stripped.startswith("#"):
        return None
    m = _NQ_LINE_RE.match(line)
    if not m:
        raise ValueError(f"malformed N-Quads line: {line[:80]!r}")
    subject = m.group("siri") if m.group("siri") is not None else m.group("sbn")
    graph = (
        m.group("giri")
        if m.group("giri") is not None
        else (m.group("gbn") or "")
    )
    if m.group("olit") is not None:
        return (
            subject, m.group("p"), _unescape(m.group("olit")),
            m.group("lang") or "", m.group("dt") or "", "literal", graph,
        )
    obj = m.group("oiri") if m.group("oiri") is not None else m.group("obn")
    return (subject, m.group("p"), obj, "", "", "iri", graph)


def read_nquads(spark: SparkSession, path: str) -> DataFrame:
    """Read an N-Quads dump into the wide quad schema.

    ``spark.read.text`` splits at line boundaries across tasks; each
    Arrow batch of lines is parsed by one Python call."""
    import pandas as pd

    lines = spark.read.text(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                t = parse_nq_line(line)
                if t is not None:
                    rows.append(t)
            yield pd.DataFrame(
                rows,
                columns=[
                    "subject", "predicate", "object",
                    "label", "datatype", "objecttype", "graph",
                ],
            )

    return lines.mapInPandas(parse, schema=QUAD_SCHEMA)
