"""Graphviz DOT export/import of the entity graph.

The visualization-interchange member of the serialization family
(Turtle / TriG / N-Triples / N-Quads / JSON-LD): the KG's entity->
entity edges as DOT ``"src" -> "dst" [label="pred"];`` lines, bytes
fully specified by this module's own escape rules (backslash then
quote, the DOT quoted-string grammar) — never a graph library — so a
golden can pin every byte.

Scale shape: one narrow pass builds lines as pure column expressions
(zero Python), bucketed by subject hash like the other exports;
``parse_dot_lines`` inverts the edge lines JVM-side with one regex.
``dot_document`` assembles a complete ``digraph`` text and is
documented SMALL-OUTPUT (a rendered diagram is a bounded artifact; the
scalable unit is the line table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 32


def _esc(c: Column) -> Column:
    # backslash FIRST, then quote — the inverse order of _unesc
    return F.replace(
        F.replace(c, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
    )


def _unesc(c: Column) -> Column:
    return F.replace(
        F.replace(c, F.lit('\\"'), F.lit('"')), F.lit("\\\\"), F.lit("\\")
    )


def to_dot_lines(triples: DataFrame) -> DataFrame:
    """Entity->entity edges as DOT lines: (bucket, line), one line per
    DISTINCT (subject, predicate, iri-object) edge, subject-hash
    bucketed."""
    edges = (
        triples.where(F.col("objecttype") == "iri")
        .select("subject", "predicate", "object")
        .dropDuplicates()
    )
    line = F.concat(
        F.lit('  "'),
        _esc(F.col("subject")),
        F.lit('" -> "'),
        _esc(F.col("object")),
        F.lit('" [label="'),
        _esc(F.col("predicate")),
        F.lit('"];'),
    )
    return edges.select(
        F.pmod(F.xxhash64("subject"), F.lit(N_BUCKETS)).alias("bucket"),
        line.alias("line"),
    )


def parse_dot_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Invert ``to_dot_lines``: (subject, predicate, object) from edge
    lines — one JVM regex, unescape in inverse order."""
    pat = r'^\s*"(.*)" -> "(.*)" \[label="(.*)"\];$'
    c = F.col(line_col)
    return lines.select(
        _unesc(F.regexp_extract(c, pat, 1)).alias("subject"),
        _unesc(F.regexp_extract(c, pat, 3)).alias("predicate"),
        _unesc(F.regexp_extract(c, pat, 2)).alias("object"),
    ).where(F.length(F.regexp_extract(c, pat, 1)) > 0)


def dot_document(triples: DataFrame, name: str = "kg") -> str:
    """Complete ``digraph`` text — SMALL-OUTPUT by contract (collects
    the line table); sort is bytewise so the text is reproducible."""
    rows = to_dot_lines(triples).select("line").orderBy("line").collect()
    body = "\n".join(r["line"] for r in rows)
    return f'digraph "{name}" {{\n' + body + "\n}\n"
