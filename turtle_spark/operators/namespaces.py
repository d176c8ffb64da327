"""Namespace/prefix induction and blank-node skolemization.

Two graph-publication operators the serializer side of the reference
implies but leaves to the caller:

* ``induce_prefixes`` — derive the ``@prefix`` table for a Turtle
  serialization from the data itself (the reference's serializer,
  ``serializer.go``, only WRITES prefixes the config seeds; at
  publish time you want the table that maximizes compression, i.e.
  the namespaces ranked by how many IRI occurrences they cover).
* ``skolemize`` — replace blank nodes with globally-stable
  ``/.well-known/genid/`` skolem IRIs (RFC 5785 well-known path, per
  the RDF 1.1 Concepts skolemization section), so anonymous nodes
  survive cross-system exchange where blank labels would collide.

Scale notes: prefix induction is one narrow explode + one hash
aggregation on the (tiny) namespace key; skolemization is a pure
per-row projection — zero shuffle, zero Python.  Both are safe at
10^12 triples: the only data-size-bound state is the namespace
aggregate, whose cardinality is the number of distinct vocabularies,
not the number of triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NS_PATTERN = r"^(.*[/#])"


def induce_prefixes(triples: DataFrame, label: str = "ns") -> DataFrame:
    """Rank namespaces by occurrence count over every IRI position.

    Output: (prefix, namespace, n_occurrences, n_distinct_iris), the
    induced ``@prefix`` table with labels ``ns1..nsK`` assigned in
    (count desc, namespace asc) order.  The rank runs on the AGGREGATED
    namespace table — but on a web corpus that aggregate is one row per
    distinct IRI host/path-stem (tens of millions), so the rank goes
    through the sketch-boundary bucketed ``exact_rank`` of
    operators/layout.py (partitioned windows + broadcast prefix
    offsets), never a single-partition global window.  Descending count
    order is expressed as an ascending rank over the NEGATED count.
    """
    is_bnode = F.col("subject").startswith("_:")
    obj_iri = (F.col("objecttype") == "iri") & ~F.col("object").startswith("_:")
    iris = triples.select(
        F.explode(
            F.array(
                F.when(~is_bnode, F.col("subject")),
                F.col("predicate"),
                F.when(obj_iri, F.col("object")),
            )
        ).alias("iri")
    ).where(F.col("iri").isNotNull())
    grouped = (
        iris.select(
            F.regexp_extract("iri", _NS_PATTERN, 1).alias("namespace"), "iri"
        )
        .where(F.col("namespace") != "")
        .groupBy("namespace")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("iri").alias("n_distinct_iris"),
        )
    )
    from turtle_spark.operators.layout import exact_rank

    ranked = exact_rank(
        grouped.withColumn("_neg", -F.col("n_occurrences")),
        ["_neg", "namespace"],
        "_r",
    )
    return ranked.select(
        F.concat(F.lit(label), (F.col("_r") + 1).cast("string")).alias(
            "prefix"
        ),
        "namespace",
        "n_occurrences",
        "n_distinct_iris",
    )


def skolemize(
    triples: DataFrame, authority: str = "https://turtle-spark.dev"
) -> DataFrame:
    """Replace blank nodes with ``<authority>/.well-known/genid/<md5>``.

    The skolem suffix is md5 of the (globalized) blank label, so the
    same anonymous node maps to the same IRI on every executor and
    every run — no coordination, no driver state.  Non-blank terms
    pass through byte-identical.
    """
    base = authority + "/.well-known/genid/"

    def sk(col_name: str):
        c = F.col(col_name)
        label = c.substr(F.lit(3), F.length(c))
        return F.when(c.startswith("_:"), F.concat(F.lit(base), F.md5(label)))

    return triples.withColumn(
        "subject", F.coalesce(sk("subject"), F.col("subject"))
    ).withColumn(
        "object",
        F.when(
            (F.col("objecttype") == "iri"),
            F.coalesce(sk("object"), F.col("object")),
        ).otherwise(F.col("object")),
    )
