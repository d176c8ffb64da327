"""RDFS entailment materialization over the triple table.

Implements the ρdf ("minimal RDFS") fragment — the publicly documented
core of RDFS reasoning (Muñoz, Pérez, Gutierrez, *Simple and Efficient
Minimal RDFS*; rule names from the public W3C RDF 1.1 Semantics
entailment tables):

* rdfs5/11 — transitivity of ``rdfs:subPropertyOf`` / ``rdfs:subClassOf``,
* rdfs7    — ``(x p y), (p ⊑ q) ⟹ (x q y)``,
* rdfs2    — ``(p domain C), (x p y) ⟹ (x type C)``,
* rdfs3    — ``(p range  C), (x p y) ⟹ (y type C)``,
* rdfs9    — ``(x type C), (C ⊑ D) ⟹ (x type D)``.

These rules stratify: subproperty closure feeds statement expansion
(rdfs7), which feeds domain/range typing (rdfs2/3), which feeds class
inheritance (rdfs9) — no rule feeds back into an earlier stratum, so
one pass per stratum computes the full fixpoint (the property that
makes ρdf tractable, and here: a FIXED number of Spark joins instead
of an unbounded semi-naive loop).

Spark shape: the schema slice (hierarchies, domain/range) is tiny at
any corpus scale — thousands of classes against billions of instance
triples — so every rule is a **broadcast join of the instance stream
against a closed schema table**; the instance side never shuffles.
The two closures run on the schema slice only, via the path-doubling
``transitive_closure`` (O(log depth) rounds).

``alignment_schema`` derives a deterministic cross-vocabulary schema
from the data itself: predicates/classes from different vocabularies
sharing a local name (``foaf:note``, ``schema:note``, ``dcterms:note``
…) are declared subproperties/subclasses of the lexicographically
smallest member — the schema-level counterpart of the pipeline's
entity canonicalization (SURVEY.md §3.4 stage D), turning vocabulary
fragmentation into queryable alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from turtle_spark.operators.graph import transitive_closure

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROP = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"

_TRIPLE_COLS = ("subject", "predicate", "object", "label", "datatype", "objecttype")


def _schema_pairs(schema: DataFrame, predicate: str) -> DataFrame:
    return schema.where(F.col("predicate") == predicate).select(
        F.col("subject").alias("src"), F.col("object").alias("dst")
    )


def _as_triples(df: DataFrame, predicate: str) -> DataFrame:
    """(src, dst) pairs -> schema-triple rows."""
    return df.select(
        F.col("src").alias("subject"),
        F.lit(predicate).alias("predicate"),
        F.col("dst").alias("object"),
        F.lit("").alias("label"),
        F.lit("").alias("datatype"),
        F.lit("iri").alias("objecttype"),
    )


def alignment_schema(triples: DataFrame) -> DataFrame:
    """Derive a cross-vocabulary alignment schema from the data.

    Every group of classes (rdf:type objects) or predicates sharing a
    LOCAL NAME (the segment after the last ``/`` or ``#``) becomes a
    one-level hierarchy under its lexicographically smallest member:
    ``member ⊑ canon`` for each non-canonical member.  RDF syntax
    machinery (``rdf:*``) is excluded — list spines and typing are not
    vocabulary fragmentation.  Output: subClassOf + subPropertyOf
    schema triples.  Deterministic (min is order-free), and the
    aggregation runs on the distinct class/predicate sets — schema-
    sized, never corpus-sized.
    """
    local = F.regexp_extract(F.col("term"), r"([^/#]+)$", 1)

    def align(terms: DataFrame, pred: str) -> DataFrame:
        grouped = (
            terms.withColumn("_local", local)
            .groupBy("_local")
            .agg(F.min("term").alias("_canon"), F.collect_set("term").alias("_ms"))
            .select("_canon", F.explode("_ms").alias("term"))
            .where(F.col("term") != F.col("_canon"))
        )
        return _as_triples(
            grouped.select(
                F.col("term").alias("src"), F.col("_canon").alias("dst")
            ),
            pred,
        )

    classes = (
        triples.where(
            (F.col("predicate") == RDF_TYPE) & (F.col("objecttype") == "iri")
        )
        .select(F.col("object").alias("term"))
        .dropDuplicates()
    )
    preds = (
        triples.select(F.col("predicate").alias("term"))
        .where(~F.col("term").startswith(RDF_NS))
        .dropDuplicates()
    )
    return align(classes, RDFS_SUBCLASS).unionByName(
        align(preds, RDFS_SUBPROP)
    )


def rdfs_entail(triples: DataFrame, schema: DataFrame) -> DataFrame:
    """Materialize the ρdf entailment delta of ``triples`` under
    ``schema`` (schema-triple rows using the rdfs vocabulary above).

    Returns only triples NOT already asserted (anti-join on the full
    logical key), ready to union into the materialized table.  All
    instance-side work is broadcast joins against closed schema
    tables; the closures run on the schema slice alone.
    """
    sub_prop = transitive_closure(_schema_pairs(schema, RDFS_SUBPROP))
    sub_cls = transitive_closure(_schema_pairs(schema, RDFS_SUBCLASS))
    domain = _schema_pairs(schema, RDFS_DOMAIN)
    range_ = _schema_pairs(schema, RDFS_RANGE)

    base = triples.select(*_TRIPLE_COLS)

    # rdfs7: statements inherit along the subproperty closure (object
    # annotations travel with the statement — a literal stays the same
    # literal under the superproperty)
    ext = (
        base.join(
            F.broadcast(sub_prop.withColumnRenamed("src", "predicate")),
            "predicate",
        )
        .select(
            "subject",
            F.col("dst").alias("predicate"),
            "object",
            "label",
            "datatype",
            "objecttype",
        )
    )
    stmts = base.unionByName(ext)

    # rdfs2/3: domain and range typing over asserted + rdfs7 statements
    type_from_domain = stmts.join(
        F.broadcast(domain.withColumnRenamed("src", "predicate")), "predicate"
    ).select(F.col("subject").alias("inst"), F.col("dst").alias("cls"))
    type_from_range = (
        stmts.where(F.col("objecttype") == "iri")
        .join(F.broadcast(range_.withColumnRenamed("src", "predicate")), "predicate")
        .select(F.col("object").alias("inst"), F.col("dst").alias("cls"))
    )
    asserted_types = stmts.where(
        (F.col("predicate") == RDF_TYPE) & (F.col("objecttype") == "iri")
    ).select(F.col("subject").alias("inst"), F.col("object").alias("cls"))

    all_types = asserted_types.union(type_from_domain).union(type_from_range)

    # rdfs9: class inheritance over every type statement derived so far
    inherited = all_types.join(
        F.broadcast(sub_cls.withColumnRenamed("src", "cls")), "cls"
    ).select(F.col("inst"), F.col("dst").alias("cls"))

    type_triples = (
        all_types.union(inherited)
        .dropDuplicates()
        .select(
            F.col("inst").alias("subject"),
            F.lit(RDF_TYPE).alias("predicate"),
            F.col("cls").alias("object"),
            F.lit("").alias("label"),
            F.lit("").alias("datatype"),
            F.lit("iri").alias("objecttype"),
        )
    )

    derived = ext.unionByName(type_triples).dropDuplicates(list(_TRIPLE_COLS))
    return derived.join(base, on=list(_TRIPLE_COLS), how="left_anti")
