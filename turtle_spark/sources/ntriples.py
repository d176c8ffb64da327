"""N-Triples source and sink.

The reference serializes Turtle only; an interoperable KG engine also
needs the line-oriented exchange format every RDF toolchain consumes
— N-Triples 1.1 (one triple per line, UTF-8, no prefixes, no parser
state).  NT is the format of choice for BULK graph export at scale
precisely because it is line-splittable: a 100 TB dump reads back
with arbitrary byte-range splits, unlike Turtle whose prefix
directives make documents stateful (which is why the Turtle reader —
`sources/turtle_io.py` — must parse whole documents).

Encode is PURE COLUMN EXPRESSIONS (nested ``replace``): the escape
set of canonical N-Triples is exactly {backslash, quote, LF, CR,
TAB} with other characters emitted verbatim as UTF-8, so the sink
whole-stage-codegens with zero Python.  The same replace chain is
expressible in DuckDB, so the export query is oracle-exact.

Blank-node labels: the engine's globalized labels
(``_:doc-…#b0``) contain characters outside NT's
``BLANK_NODE_LABEL`` production, so the writer renames them
deterministically to ``_:b<md5(label)>`` — collision-free in
practice (128-bit) and stable across exports, so diffs between two
dumps still align.  Reading an engine-written dump back therefore
yields identical graph STRUCTURE with renamed blank labels (the
usual RDF skolemization caveat; blank labels are file-scoped by
spec anyway).

Decode (``read_ntriples``) is a per-LINE parser in ``mapInPandas``
(Arrow batches, one Python call per batch, a regex per line — no
per-row UDF): the grammar is regular, unlike Turtle's.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["to_ntriples", "write_ntriples", "read_ntriples", "TRIPLE_SCHEMA"]

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StringType()),
        T.StructField("predicate", T.StringType()),
        T.StructField("object", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("datatype", T.StringType()),
        T.StructField("objecttype", T.StringType()),
    ]
)


def _escape(c: Column) -> Column:
    # ORDER MATTERS: backslash first or it re-escapes its own output
    out = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


def _node(c: Column) -> Column:
    return F.when(
        c.startswith("_:"), F.concat(F.lit("_:b"), F.md5(c))
    ).otherwise(F.concat(F.lit("<"), c, F.lit(">")))


def to_ntriples(triples: DataFrame) -> DataFrame:
    """Render the wide triple table to one ``line`` column of
    canonical N-Triples (no trailing newline per row)."""
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
    obj = F.when(F.col("objecttype") == "literal", lit).otherwise(
        _node(F.col("object"))
    )
    line = F.concat_ws(
        " ",
        _node(F.col("subject")),
        F.concat(F.lit("<"), F.col("predicate"), F.lit(">")),
        obj,
        F.lit("."),
    )
    return triples.select(line.alias("line"))


def write_ntriples(triples: DataFrame, path: str) -> None:
    """Export the triple table as an N-Triples dump — one UTF-8 text
    part-file per partition, line-splittable on read at any scale."""
    to_ntriples(triples).write.mode("overwrite").text(path)


_UNESCAPE = {
    "\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t",
}
_UNESCAPE_RE = re.compile(r"\\[\\\"nrt]")

_LINE_RE = re.compile(
    r"^\s*"
    r"(<(?P<siri>[^>]*)>|(?P<sbn>_:\S+))\s+"
    r"<(?P<p>[^>]*)>\s+"
    r"(<(?P<oiri>[^>]*)>"
    r"|(?P<obn>_:\S+)"
    r'|"(?P<olit>(?:[^"\\]|\\.)*)"'
    r"(?:@(?P<lang>[A-Za-z0-9-]+)|\^\^<(?P<dt>[^>]*)>)?)"
    r"\s*\.\s*$"
)


def _unescape(s: str) -> str:
    return _UNESCAPE_RE.sub(lambda m: _UNESCAPE[m.group(0)], s)


def parse_nt_line(line: str) -> tuple | None:
    """One N-Triples line -> wide-schema tuple, None for blank or
    comment lines.  Raises ValueError on malformed input."""
    stripped = line.strip()
    if not stripped or stripped.startswith("#"):
        return None
    m = _LINE_RE.match(line)
    if not m:
        raise ValueError(f"malformed N-Triples line: {line[:80]!r}")
    subject = m.group("siri") if m.group("siri") is not None else m.group("sbn")
    if m.group("olit") is not None:
        return (
            subject, m.group("p"), _unescape(m.group("olit")),
            m.group("lang") or "", m.group("dt") or "", "literal",
        )
    obj = m.group("oiri") if m.group("oiri") is not None else m.group("obn")
    return (subject, m.group("p"), obj, "", "", "iri")


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Read an N-Triples dump into the wide triple schema.

    ``spark.read.text`` splits the file at line boundaries across
    tasks (NT's whole point); each Arrow batch of lines is parsed by
    one Python call over the regular NT grammar."""
    import pandas as pd

    lines = spark.read.text(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                t = parse_nt_line(line)
                if t is not None:
                    rows.append(t)
            yield pd.DataFrame(
                rows,
                columns=[
                    "subject", "predicate", "object",
                    "label", "datatype", "objecttype",
                ],
            )

    return lines.mapInPandas(parse, schema=TRIPLE_SCHEMA)
