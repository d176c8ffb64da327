"""SHACL-lite shape validation over the triple table.

KG quality gating: after extraction + canonicalization, a production
pipeline validates the materialized graph against shape constraints
before publishing a snapshot — exactly SHACL's node-shape core
(sh:targetClass, sh:path, sh:minCount/maxCount, sh:nodeKind,
sh:datatype, sh:class, sh:pattern), here over the engine's wide
triple schema (subject, predicate, object, label, datatype,
objecttype).  No counterpart in `/root/reference` (a parser library);
this is the publish-gate stage of the pipeline (SURVEY.md §2.2).

Validation semantics are over the GRAPH (set) view: the scanner
keeps duplicate triples (reference quirk #4), but a shape constraint
like maxCount counts distinct value nodes, mirroring the reference's
own dedup-on-insert graph semantics (`graph/graph.go:48-96` — S1).
So the first step is one dropDuplicates over the six columns.

Scale shape:

* the shape table is tiny by construction -> broadcast everywhere;
  the instance stream shuffles once for the per-focus count
  aggregation and never for the per-value checks (narrow filters);
* focus selection is types ⋈ broadcast(shapes) — the type scan
  prunes to the predicate column's rdf:type slice (partition-prunable
  on the bucketed triple table);
* sh:class is the one check needing a second pass over the data: a
  LEFT SEMI-shaped join of value nodes against the typed-node set —
  an equi join on the object key, never a cartesian.

Constraint names in the report: ``minCount``, ``maxCount``,
``nodeKind``, ``datatype``, ``class``, ``pattern``.  ``sh:pattern``
regexes are restricted to the Java ∩ RE2 ∩ Python dialect (same rule
as curation.py's PII patterns) so oracles mirror exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

__all__ = ["Shape", "validate"]


@dataclass(frozen=True)
class Shape:
    """One property shape: constraints on ``predicate`` values of
    instances of ``target_class``.  ``datatype=""`` means the value
    must be a PLAIN literal (no datatype, no language tag — SHACL
    would say xsd:string excluding rdf:langString)."""

    shape_id: str
    target_class: str
    predicate: str
    min_count: int | None = None
    max_count: int | None = None
    node_kind: str | None = None  # "iri" | "literal"
    datatype: str | None = None
    object_class: str | None = None
    pattern: str | None = None


def validate(triples: DataFrame, shapes: list[Shape]) -> DataFrame:
    """Validate the graph against ``shapes``.

    Returns the violation report ``(shape_id, constraint, focus,
    value)`` — ``value`` is NULL for the count constraints and the
    offending object value otherwise.  An empty result = conformant.
    """
    if not shapes:
        raise ValueError("no shapes to validate")
    from turtle_spark.operators.skew import pin

    spark = triples.sparkSession
    # pinned: the report unions five constraint branches and every one
    # references the deduped graph (directly or via vals) — without
    # the pins Catalyst re-evaluates the dedup shuffle and the
    # focus/value join once PER BRANCH (measured 31 shuffles vs 7)
    graph = pin(
        triples.dropDuplicates(
            ["subject", "predicate", "object", "label", "datatype", "objecttype"]
        )
    )

    shp = F.broadcast(
        spark.createDataFrame(
            [
                (
                    s.shape_id, s.target_class, s.predicate, s.min_count,
                    s.max_count, s.node_kind, s.datatype, s.object_class,
                    s.pattern,
                )
                for s in shapes
            ],
            "shape_id string, target_class string, pred string, "
            "min_count int, max_count int, node_kind string, "
            "req_datatype string, object_class string, pattern string",
        )
    )

    types = graph.where(F.col("predicate") == _RDF_TYPE).select(
        F.col("subject").alias("node"), F.col("object").alias("cls")
    )
    focus = types.join(shp, types["cls"] == shp["target_class"]).select(
        "shape_id", F.col("node").alias("focus"), "pred", "min_count",
        "max_count", "node_kind", "req_datatype", "object_class", "pattern",
    )

    vals = pin(
        focus.join(
            graph,
            (focus["focus"] == graph["subject"])
            & (focus["pred"] == graph["predicate"]),
            how="left",
        ).select(
            "shape_id", "focus", "min_count", "max_count", "node_kind",
            "req_datatype", "object_class", "pattern",
            "object", "label", "datatype", "objecttype",
        )
    )

    counts = vals.groupBy(
        "shape_id", "focus", "min_count", "max_count"
    ).agg(F.count("object").alias("cnt"))
    count_viol = (
        counts.where(
            (F.col("min_count").isNotNull() & (F.col("cnt") < F.col("min_count")))
        )
        .select("shape_id", F.lit("minCount").alias("constraint"), "focus",
                F.lit(None).cast("string").alias("value"))
        .unionByName(
            counts.where(
                F.col("max_count").isNotNull() & (F.col("cnt") > F.col("max_count"))
            ).select("shape_id", F.lit("maxCount").alias("constraint"), "focus",
                     F.lit(None).cast("string").alias("value"))
        )
    )

    present = vals.where(F.col("object").isNotNull())
    kind_viol = present.where(
        F.col("node_kind").isNotNull()
        & (F.col("objecttype") != F.col("node_kind"))
    ).select("shape_id", F.lit("nodeKind").alias("constraint"), "focus",
             F.col("object").alias("value"))
    dt_viol = present.where(
        F.col("req_datatype").isNotNull()
        & (F.col("objecttype") == "literal")
        & (
            F.when(
                F.col("req_datatype") == "",
                (F.col("datatype") != "") | (F.col("label") != ""),
            ).otherwise(F.col("datatype") != F.col("req_datatype"))
        )
    ).select("shape_id", F.lit("datatype").alias("constraint"), "focus",
             F.col("object").alias("value"))
    pat_viol = present.where(
        F.col("pattern").isNotNull()
        & ~F.regexp_like(F.col("object"), F.col("pattern"))
    ).select("shape_id", F.lit("pattern").alias("constraint"), "focus",
             F.col("object").alias("value"))

    class_checked = present.where(F.col("object_class").isNotNull())
    typed_as = types.select(
        F.col("node").alias("object"), F.col("cls").alias("object_cls")
    )
    cls_viol = (
        class_checked.join(
            typed_as,
            (class_checked["object"] == typed_as["object"])
            & (class_checked["object_class"] == typed_as["object_cls"]),
            how="left_anti",
        )
        .select("shape_id", F.lit("class").alias("constraint"), "focus",
                F.col("object").alias("value"))
    )

    return (
        count_viol.unionByName(kind_viol)
        .unionByName(dt_viol)
        .unionByName(pat_viol)
        .unionByName(cls_viol)
    )
