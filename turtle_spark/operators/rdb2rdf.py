"""Relational -> RDF direct mapping (W3C RDB2RDF "Direct Mapping").

The reference engine (nvkp/turtle, core parser ``turtle.go``) only
*consumes* Turtle text; a production KG-construction pipeline also
ingests RELATIONAL sources straight into the triple table.  This
operator maps any DataFrame with a single-column primary key to
(subject, predicate, object) rows following the W3C recommendation
"A Direct Mapping of Relational Data to RDF":

* one row node IRI per row:      ``<base><table>/<pk>=<value>``
* one class triple per row:      ``rdf:type -> <base><table>``
* one literal triple per column: ``<base><table>#<col>`` with the
  column's lexical form and xsd datatype (foreign-key columns emit
  no literal triple, per the recommendation)
* one reference triple per FK:   ``<base><table>#ref-<col>`` whose
  object is the REFERENCED table's row node IRI

NULL columns emit no triple (SQL NULL has no RDF representation).

Scale notes: the whole mapping is ONE narrow projection per table —
``inline(array(struct(...)))`` explodes row -> triples inside
whole-stage codegen with zero shuffle and zero Python.  At 10^12
input rows the output streams straight into the subject-hash
partitioned triple table (operators/extract.py materialize path);
nothing ever lands on the driver.  Lexical forms are produced by
JVM ``CAST(... AS STRING)`` so the map stays vectorized.

No counterpart exists in the reference repo (it is a parser, not an
ingestion engine); semantics follow the public W3C rec only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@dataclass(frozen=True)
class Ref:
    """A foreign-key reference ``column -> target_table.target_pk``."""

    column: str
    target_table: str
    target_pk: str


def row_node(base: str, table: str, pk_col: str, value: Column) -> Column:
    """The row-node IRI ``<base><table>/<pk_col>=<value>``."""
    return F.concat(F.lit(f"{base}{table}/{pk_col}="), value.cast("string"))


def direct_map(
    df: DataFrame,
    *,
    table: str,
    base: str,
    pk: str,
    literals: Sequence[Tuple[str, str, Optional[Column]]],
    refs: Iterable[Ref] = (),
) -> DataFrame:
    """Map one relational DataFrame to direct-mapping triples.

    ``literals`` is a sequence of ``(column, xsd_local_name, render)``;
    ``render`` overrides the lexical form (default: CAST to string —
    pass e.g. ``F.col(c).cast("decimal(12,2)").cast("string")`` to pin
    a scale).  Returns columns (subject, predicate, object,
    objecttype, datatype); ``datatype`` is NULL on IRI objects.
    """
    subject = row_node(base, table, pk, F.col(pk))
    entries = [
        F.struct(
            F.lit(RDF_TYPE).alias("predicate"),
            F.lit(f"{base}{table}").alias("object"),
            F.lit("iri").alias("objecttype"),
            F.lit(None).cast("string").alias("datatype"),
        )
    ]
    for name, xsd_local, render in literals:
        obj = render if render is not None else F.col(name).cast("string")
        entries.append(
            F.struct(
                F.lit(f"{base}{table}#{name}").alias("predicate"),
                obj.alias("object"),
                F.lit("literal").alias("objecttype"),
                F.lit(XSD + xsd_local).cast("string").alias("datatype"),
            )
        )
    for ref in refs:
        entries.append(
            F.struct(
                F.lit(f"{base}{table}#ref-{ref.column}").alias("predicate"),
                row_node(
                    base, ref.target_table, ref.target_pk, F.col(ref.column)
                ).alias("object"),
                F.lit("iri").alias("objecttype"),
                F.lit(None).cast("string").alias("datatype"),
            )
        )
    return df.select(subject.alias("subject"), F.inline(F.array(*entries))).where(
        F.col("object").isNotNull()
    )
