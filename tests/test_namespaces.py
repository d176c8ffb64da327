"""Prefix induction (operators/namespaces.py): label order matches the
global-window definition, and the plan has no single-partition window
(the namespace aggregate is web-corpus-cardinality — VERDICT r4 §wrong.1)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from turtle_spark.operators.namespaces import induce_prefixes
from tests.test_layout import _unpartitioned_windows


def _triples(spark):
    rows = []
    for host in range(40):
        for i in range(host + 1):  # distinct per-namespace counts
            rows.append(
                (
                    f"http://h{host}.example/s{i}",
                    f"http://h{host}.example/p{i % 3}",
                    f"http://h{(host + 1) % 40}.example/o{i}",
                    "iri",
                )
            )
    rows.append(("_:b0", "http://h0.example/p0", "plain", "literal"))
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string, objecttype string"
    )


def test_induce_prefixes_matches_global_window(spark):
    df = _triples(spark)
    got = {
        r["namespace"]: (r["prefix"], r["n_occurrences"], r["n_distinct_iris"])
        for r in induce_prefixes(df).collect()
    }
    # reference definition: row_number over (count desc, namespace asc)
    is_bnode = F.col("subject").startswith("_:")
    obj_iri = (F.col("objecttype") == "iri") & ~F.col("object").startswith("_:")
    iris = df.select(
        F.explode(
            F.array(
                F.when(~is_bnode, F.col("subject")),
                F.col("predicate"),
                F.when(obj_iri, F.col("object")),
            )
        ).alias("iri")
    ).where(F.col("iri").isNotNull())
    want = {
        r["namespace"]: (r["prefix"], r["n_occurrences"], r["n_distinct_iris"])
        for r in iris.select(
            F.regexp_extract("iri", r"^(.*[/#])", 1).alias("namespace"), "iri"
        )
        .where(F.col("namespace") != "")
        .groupBy("namespace")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("iri").alias("n_distinct_iris"),
        )
        .select(
            F.concat(
                F.lit("ns"),
                F.row_number()
                .over(Window.orderBy(F.desc("n_occurrences"), F.asc("namespace")))
                .cast("string"),
            ).alias("prefix"),
            "namespace",
            "n_occurrences",
            "n_distinct_iris",
        )
        .collect()
    }
    assert got == want


def test_induce_prefixes_plan_has_no_unpartitioned_window(spark):
    out = induce_prefixes(_triples(spark))
    assert _unpartitioned_windows(out) == []
