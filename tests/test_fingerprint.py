"""Unit tests for blank-node-invariant graph fingerprints
(operators/fingerprint.py)."""

from __future__ import annotations

from turtle_spark.operators.fingerprint import graph_fingerprints

COLS = "doc_id string, subject string, predicate string, object string, label string, datatype string, objecttype string"


def _fps(spark, rows):
    out = graph_fingerprints(spark.createDataFrame(rows, COLS)).collect()
    return {r.doc_id: (r.graph_fp, r.n_triples, r.n_blanks) for r in out}


def test_relabeled_docs_fingerprint_identically(spark):
    # d2 is d1 with blank labels permuted (b0<->b1) — same graph
    rows = [
        ("d1", "http://x/s", "http://x/p", "_:b0", "", "", "iri"),
        ("d1", "_:b0", "http://x/q", "_:b1", "", "", "iri"),
        ("d1", "_:b1", "http://x/r", "v", "", "", "literal"),
        ("d2", "http://x/s", "http://x/p", "_:b1", "", "", "iri"),
        ("d2", "_:b1", "http://x/q", "_:b0", "", "", "iri"),
        ("d2", "_:b0", "http://x/r", "v", "", "", "literal"),
    ]
    fps = _fps(spark, rows)
    assert fps["d1"] == fps["d2"]
    assert fps["d1"][2] == 2  # both blanks counted


def test_structurally_different_docs_differ(spark):
    # chain (s -> b0 -> b1) vs fan (s -> b0, s -> b1): same triple
    # count and blank count, different shape
    rows = [
        ("chain", "http://x/s", "http://x/p", "_:b0", "", "", "iri"),
        ("chain", "_:b0", "http://x/p", "_:b1", "", "", "iri"),
        ("fan", "http://x/s", "http://x/p", "_:b0", "", "", "iri"),
        ("fan", "http://x/s", "http://x/p", "_:b1", "", "", "iri"),
    ]
    fps = _fps(spark, rows)
    assert fps["chain"][0] != fps["fan"][0]


def test_literal_lookalike_never_colored(spark):
    # the literal "_:b0" must hash as a literal, not pick up b0's color
    rows = [
        ("da", "_:b0", "http://x/p", "_:b0", "", "", "literal"),
        ("db", "_:b0", "http://x/p", "_:zz", "", "", "literal"),
    ]
    fps = _fps(spark, rows)
    # different literal text -> different fingerprints even though the
    # blank structure is identical
    assert fps["da"][0] != fps["db"][0]
    assert fps["da"][2] == fps["db"][2] == 1


def test_blank_free_docs_have_zero_blanks_and_content_fp(spark):
    rows = [
        ("d", "http://x/s", "http://x/p", "o", "", "", "literal"),
    ]
    fps = _fps(spark, rows)
    assert fps["d"][2] == 0 and fps["d"][1] == 1


def test_matches_pure_python_golden(spark):
    from tools.golden_ref import _wl_fingerprint

    rows = [
        ("d", "http://x/s", "http://x/p", "_:a", "", "", "iri"),
        ("d", "_:a", "http://x/q", "_:b", "", "", "iri"),
        ("d", "_:b", "http://x/q", "lit", "", "xsd:string", "literal"),
        ("d", "_:b", "http://x/r", "http://x/o", "", "", "iri"),
    ]
    fps = _fps(spark, rows)
    fp, n_t, n_b = _wl_fingerprint([r[1:] for r in rows])
    assert fps["d"] == (fp, n_t, n_b)


def test_corpus_fingerprints_blank_invariant(spark):
    # the invariance proof formerly computed IN-PLAN by
    # q_graph_fingerprint: every corpus fingerprint must be identical
    # on a blank-RENAMED copy (labels reversed — an arbitrary
    # bijection).  Here it costs one pytest run instead of doubling
    # the bench query forever.
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    t = __import__("__spark_entry__")._corpus_triples(spark).persist()
    ren = lambda c: F.when(  # noqa: E731
        F.col(c).startswith("_:"),
        F.concat(F.lit("_:"), F.reverse(F.expr(f"substring({c}, 3)"))),
    ).otherwise(F.col(c))
    renamed = t.withColumn("subject", ren("subject")).withColumn(
        "object",
        F.when(F.col("objecttype") == "iri", ren("object")).otherwise(
            F.col("object")
        ),
    )
    fp1 = {
        r["doc_id"]: r["graph_fp"]
        for r in graph_fingerprints(t).where(F.col("n_blanks") > 0).collect()
    }
    fp2 = {
        r["doc_id"]: r["graph_fp"]
        for r in graph_fingerprints(renamed).collect()
    }
    assert fp1 and all(fp2[d] == fp for d, fp in fp1.items())
    t.unpersist()
