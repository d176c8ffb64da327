"""Unit tests for operators/property_table.py and operators/importance.py.

Full-value cross-engine parity runs in tests/test_oracle_parity.py
(goldens recomputed by tools/golden_ref.py); these pin the operator
semantics on hand-built inputs and the plan shapes.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_property_table_pivot_and_min_dedup(spark):
    from turtle_spark.operators.property_table import property_table

    t = spark.createDataFrame(
        [
            ("s1", "p:name", "zeta"),
            ("s1", "p:name", "alpha"),  # duplicate value -> min wins
            ("s1", "p:age", "3"),
            ("s2", "p:age", "9"),
            ("s3", "p:other", "x"),  # not a chosen column -> row absent
        ],
        "subject string, predicate string, object string",
    )
    rows = {
        r.subject: (r.p0, r.p1)
        for r in property_table(t, ["p:name", "p:age"]).collect()
    }
    assert rows == {"s1": ("alpha", "3"), "s2": (None, "9")}


def test_choose_columns_rule(spark):
    from turtle_spark.operators.property_table import choose_columns

    profile = spark.createDataFrame(
        [
            ("p:a", 10, True),
            ("p:b", 90, True),
            ("p:c", 90, True),
            ("p:multi", 999, False),
        ],
        "predicate string, n_triples long, is_functional boolean",
    )
    assert choose_columns(profile, max_cols=2) == ["p:b", "p:c"]


@pytest.fixture(scope="module")
def toy_docs(spark):
    return spark.createDataFrame(
        [
            (0, "aaab", "en"),   # train slice (id % 10 == 0)
            (1, "aaa", "en"),    # grams: aaa
            (2, "zzz", "de"),    # OOV gram
            (3, "ab", "en"),     # too short -> absent from lm output
        ],
        "doc_id long, text string, lang string",
    )


def test_lm_quality_quantized_scores(toy_docs):
    from turtle_spark.operators.importance import lm_quality

    out = {r.doc_id: r for r in lm_quality(toy_docs).collect()}
    # model from doc 0 ("aaab"): aaa->1, aab->1
    # doc 1: one gram "aaa", count 1 -> floor_log2(2) = 1
    assert (out[1].n_grams, out[1].score_num, out[1].n_oov) == (1, 1, 0)
    assert out[1].lm_q == 1.0
    # doc 2: "zzz" OOV -> floor_log2(1) = 0
    assert (out[2].n_grams, out[2].score_num, out[2].n_oov) == (1, 0, 1)
    assert 3 not in out  # no trigram, never enters the aggregation


def test_dsir_weight_sign_tracks_target_affinity(spark):
    from turtle_spark.operators.importance import dsir_weights

    docs = spark.createDataFrame(
        [
            (1, "good data good data good data", "en"),
            (2, "good data good data", "en"),
            (3, "bad noise bad noise bad noise", "de"),
            (4, "good data bad noise", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in dsir_weights(docs, F.col("lang") == "en").collect()}
    # floor-log2 quantization: target-dominated bigrams round to ~0
    # (target count ~ raw count), non-target bigrams score negative
    assert out[1].dsir_w == 0.0
    assert out[3].dsir_w < 0
    assert out[1].dsir_w > out[4].dsir_w > out[3].dsir_w


def test_lm_model_join_is_broadcast(toy_docs):
    from turtle_spark.operators.importance import lm_quality

    plan = lm_quality(toy_docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
