"""JSON-LD node-object lines — one expanded-form node object per
subject per line (NDJSON).

The fourth exchange format next to Turtle/TriG (human-readable, not
splittable) and N-Triples/N-Quads (line-regular, one TRIPLE per
line): JSON-LD lines are line-regular with one SUBJECT per line, the
shape JSON-native consumers (document stores, API pipelines, LLM
ingestion) take without an RDF parser.  Expanded form only — no
@context compaction — so every line is self-contained and the format
needs no out-of-band state, the property that makes it splittable at
any byte boundary at 100 TB.

Layout per line (keys sorted, values sorted, bytes fully specified by
this module — NOT Jackson's ``to_json``, whose escaping/key-order
would be a moving target for the oracle)::

    {"@id":"http://x/a","http://x/p":[{"@value":"hello"}],
     "http://x/q":[{"@id":"http://x/b"}]}

Value objects follow JSON-LD 1.1 expanded term semantics:
``{"@value": s}`` (+ ``"@language"`` or ``"@type"``) for literals,
``{"@id": iri-or-blank}`` for nodes.

Encode is pure column work: the escape chain is the N-Triples one
(``sources/ntriples.py::_escape`` — the same five JSON-mandatory
escapes), entries assemble with concat/sort_array, and the whole line
codegens; two aggregations — (subject, predicate) then (subject) —
both key-bounded.  Decode is ``json.loads`` per Arrow batch (standard
JSON unescape is a superset of the escape chain), one Python call per
batch like the NT/NQ readers.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from turtle_spark.sources.ntriples import TRIPLE_SCHEMA, _escape

__all__ = ["to_jsonld_lines", "read_jsonld_lines", "write_jsonld_lines"]


def _jstr(c: Column) -> Column:
    """A JSON string token: quoted + escaped."""
    return F.concat(F.lit('"'), _escape(c), F.lit('"'))


def _bare_datatype(c: Column) -> Column:
    """Datatype IRIs ride in the triple model as written (``<...>``
    when angle-bracketed in the source); JSON-LD @type wants the bare
    IRI."""
    return F.when(
        c.startswith("<") & c.endswith(">"),
        F.substring(c, 2, F.length(c) - 2),
    ).otherwise(c)


def to_jsonld_lines(triples: DataFrame) -> DataFrame:
    """Render the wide triple table to ``(subject, line)`` — one
    JSON-LD expanded node object per subject.

    Deterministic bytes at any parallelism: predicates sort within the
    line, value objects sort within each predicate array, duplicate
    triples collapse (SET semantics — same as the Turtle sink's S1
    dedup).
    """
    val = F.when(
        F.col("objecttype") == "literal",
        F.concat(
            F.lit('{"@value":'),
            _jstr(F.col("object")),
            F.when(
                F.col("label") != "",
                F.concat(F.lit(',"@language":'), _jstr(F.col("label"))),
            ).otherwise(
                F.when(
                    F.col("datatype") != "",
                    F.concat(
                        F.lit(',"@type":'),
                        _jstr(_bare_datatype(F.col("datatype"))),
                    ),
                ).otherwise(F.lit(""))
            ),
            F.lit("}"),
        ),
    ).otherwise(F.concat(F.lit('{"@id":'), _jstr(F.col("object")), F.lit("}")))

    entries = (
        triples.select("subject", "predicate", val.alias("_v"))
        .groupBy("subject", "predicate")
        .agg(
            F.concat(
                _jstr(F.col("predicate")),
                F.lit(":["),
                F.concat_ws(",", F.array_sort(F.collect_set("_v"))),
                F.lit("]"),
            ).alias("_entry")
        )
    )
    return (
        entries.groupBy("subject")
        .agg(
            F.concat(
                F.lit('{"@id":'),
                _jstr(F.col("subject")),
                F.lit(","),
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("predicate", "_entry"))),
                        lambda s: s["_entry"],
                    ),
                ),
                F.lit("}"),
            ).alias("line")
        )
        .select("subject", "line")
    )


def write_jsonld_lines(triples: DataFrame, path: str) -> None:
    """Export as NDJSON — one UTF-8 part-file per partition,
    line-splittable on read at any scale."""
    to_jsonld_lines(triples).select("line").write.mode("overwrite").text(path)


def read_jsonld_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse JSON-LD node-object lines back to the wide triple table.

    ``@type`` datatypes come back angle-bracketed (the triple model's
    as-written form for IRI datatypes).  Non-object array members and
    non-array values are tolerated per the JSON-LD grammar's
    single-value shorthand.
    """

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[line_col]:
                if not raw or not raw.strip():
                    continue
                node = json.loads(raw)
                subject = node.get("@id", "")
                for pred, vals in node.items():
                    if pred == "@id":
                        continue
                    if not isinstance(vals, list):
                        vals = [vals]
                    for v in vals:
                        if not isinstance(v, dict):
                            v = {"@value": v}
                        if "@id" in v:
                            rows.append(
                                (subject, pred, v["@id"], "", "", "iri")
                            )
                        else:
                            dt = v.get("@type", "")
                            rows.append(
                                (
                                    subject,
                                    pred,
                                    str(v.get("@value", "")),
                                    v.get("@language", ""),
                                    f"<{dt}>" if dt else "",
                                    "literal",
                                )
                            )
            yield pd.DataFrame(
                rows,
                columns=[
                    "subject", "predicate", "object",
                    "label", "datatype", "objecttype",
                ],
            )

    return lines.mapInPandas(parse_batch, schema=TRIPLE_SCHEMA)
