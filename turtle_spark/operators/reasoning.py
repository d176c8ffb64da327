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


OWL_INVERSE = "http://www.w3.org/2002/07/owl#inverseOf"
OWL_SYMMETRIC = "http://www.w3.org/2002/07/owl#SymmetricProperty"
OWL_TRANSITIVE = "http://www.w3.org/2002/07/owl#TransitiveProperty"


def owl_property_entail(triples: DataFrame, schema: DataFrame) -> DataFrame:
    """OWL 2 RL property-rule delta (public rule names from the W3C
    OWL 2 Profiles spec, table "The Semantics of Property Axioms"):

    * prp-inv1/2 — ``(p owl:inverseOf q), (x p y) ⟹ (y q x)`` and the
      mirror ``(x q y) ⟹ (y p x)``;
    * prp-symp  — ``(p a owl:SymmetricProperty), (x p y) ⟹ (y p x)``;
    * prp-trp   — ``(p a owl:TransitiveProperty)`` ⟹ the transitive
      closure of p's edge set.

    ``schema``: schema-triple rows asserting those axioms.  Returns
    one row per (rule, derived triple) NOT already asserted — per-rule
    deltas may overlap when two rules derive the same triple (callers
    materializing the graph should dedup on the triple key after
    dropping ``rule``).

    Spark shape mirrors ``rdfs_entail``: instance-side joins broadcast
    the closed schema slice, so the corpus never shuffles for the
    inverse/symmetric rules (they are projections of a broadcast-
    filtered scan).  Only prp-trp shuffles: the closure runs per
    transitive predicate on that predicate's edge slice via the
    path-doubling ``transitive_closure`` (O(log depth) rounds).  The
    transitive predicate list is schema-sized and collected to the
    driver — bounded by the ontology, not the corpus.
    """
    inv = F.broadcast(
        schema.where(F.col("predicate") == OWL_INVERSE).select(
            F.col("subject").alias("p"), F.col("object").alias("q")
        )
    )
    sym = F.broadcast(
        schema.where(
            (F.col("predicate") == RDF_TYPE) & (F.col("object") == OWL_SYMMETRIC)
        ).select(F.col("subject").alias("p"))
    )
    trans_preds = [
        r["subject"]
        for r in schema.where(
            (F.col("predicate") == RDF_TYPE) & (F.col("object") == OWL_TRANSITIVE)
        )
        .select("subject")
        .distinct()
        .collect()
    ]

    base = triples.select(*_TRIPLE_COLS)
    # only IRI-object statements participate: a literal cannot be the
    # subject of the flipped/inverted triple
    edges = base.where(F.col("objecttype") == "iri").select(
        "subject", "predicate", "object"
    )

    def flipped(bound: DataFrame, rule: str, out_pred) -> DataFrame:
        return bound.select(
            F.lit(rule).alias("rule"),
            F.col("object").alias("subject"),
            out_pred.alias("predicate"),
            F.col("subject").alias("object"),
            F.lit("").alias("label"),
            F.lit("").alias("datatype"),
            F.lit("iri").alias("objecttype"),
        )

    parts = [
        flipped(
            edges.join(inv, edges["predicate"] == inv["p"]), "prp-inv1", F.col("q")
        ),
        flipped(
            edges.join(inv, edges["predicate"] == inv["q"]), "prp-inv2", F.col("p")
        ),
        flipped(
            edges.join(sym, edges["predicate"] == sym["p"]),
            "prp-symp",
            edges["predicate"],
        ),
    ]
    for pred in sorted(trans_preds):
        closure = transitive_closure(
            edges.where(F.col("predicate") == pred).select(
                F.col("subject").alias("src"), F.col("object").alias("dst")
            )
        )
        parts.append(
            _as_triples(closure, pred).select(F.lit("prp-trp").alias("rule"), "*")
        )

    derived = parts[0]
    for p in parts[1:]:
        derived = derived.unionByName(p)
    derived = derived.dropDuplicates(["rule", *_TRIPLE_COLS])
    return derived.join(base, on=list(_TRIPLE_COLS), how="left_anti")


def owl_chain_entail(
    triples: DataFrame,
    chains: list[tuple[str, str, str]],
) -> DataFrame:
    """OWL 2 RL **prp-spo2** (property chains): for each axiom
    ``head owl:propertyChainAxiom (p1 p2)``, derive
    ``s head o`` from ``s p1 x . x p2 o`` — the rule behind
    "grandparent = parent∘parent" style composed relations, the one
    property rule ``owl_property_entail`` leaves out.

    ``chains``: bounded axiom list (schema-sized, like the broadcast
    ontology of the other rules).  Plan per chain: two predicate-
    filtered slices of the IRI-edge stream equi-joined on the chain's
    MIDDLE node — one shuffle keyed on that node; the axiom list
    itself never shuffles.  Already-asserted heads are removed with
    the same left-anti the other rule deltas use.

    Returns (rule, subject, predicate, object, label, datatype,
    objecttype) with rule = 'prp-spo2'.
    """
    from turtle_spark.operators.skew import pin

    if not chains:
        # chains come from data-dependent axiom discovery (e.g. a
        # top-2 collect); an empty composition set yields an empty
        # delta with the standard schema, mirroring how the other
        # entailment rules handle no-axiom inputs
        return triples.sparkSession.createDataFrame(
            [],
            "rule string, subject string, predicate string, "
            "object string, label string, datatype string, "
            "objecttype string",
        )
    edges = pin(
        triples.where(F.col("objecttype") == "iri").select(
            "subject", "predicate", "object"
        ).dropDuplicates()
    )
    parts = []
    for head, p1, p2 in chains:
        a = edges.where(F.col("predicate") == p1).select(
            F.col("subject").alias("s"), F.col("object").alias("mid")
        )
        b = edges.where(F.col("predicate") == p2).select(
            F.col("subject").alias("mid"), F.col("object").alias("o")
        )
        parts.append(
            a.join(b, "mid")
            .select(
                F.lit("prp-spo2").alias("rule"),
                F.col("s").alias("subject"),
                F.lit(head).alias("predicate"),
                F.col("o").alias("object"),
                F.lit("").alias("label"),
                F.lit("").alias("datatype"),
                F.lit("iri").alias("objecttype"),
            )
        )
    derived = parts[0]
    for p in parts[1:]:
        derived = derived.unionByName(p)
    derived = derived.dropDuplicates(["rule", *_TRIPLE_COLS])
    base = triples.select(*_TRIPLE_COLS)
    return derived.join(base, on=list(_TRIPLE_COLS), how="left_anti")
