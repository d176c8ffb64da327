"""Round-3 operators: per-source capping, duplicate spans, KG snapshot
delta, entity cards.

Each operator's driver query is additionally pinned against the DuckDB
oracle / corpus golden by test_oracle_parity.py; these tests exercise
the operator semantics directly on hand-built inputs where the expected
answer is checkable by eye.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from turtle_spark.operators.curation import cap_per_source
from turtle_spark.operators.dedup import duplicate_spans
from turtle_spark.operators.graph import entity_cards, snapshot_delta


# --------------------------------------------------------------------------
# cap_per_source
# --------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_cap_per_source_caps_each_source(spark):
    rows = [(i, f"s{i % 3}", "x") for i in range(60)]
    out = cap_per_source(_docs(spark, rows), cap=5).collect()
    per_src: dict[str, int] = {}
    for r in out:
        per_src[r.source] = per_src.get(r.source, 0) + 1
        assert 1 <= r.rank_in_source <= 5
    assert per_src == {"s0": 5, "s1": 5, "s2": 5}


def test_cap_per_source_below_cap_keeps_all(spark):
    rows = [(i, "only", "x") for i in range(3)]
    out = cap_per_source(_docs(spark, rows), cap=10).collect()
    assert sorted(r.doc_id for r in out) == [0, 1, 2]
    assert sorted(r.rank_in_source for r in out) == [1, 2, 3]


def test_cap_per_source_deterministic_and_margin_insensitive_selection(spark):
    """The kept set is a pure function of (keys, cap): reruns agree,
    and a tighter prefilter margin that still passes >= cap rows picks
    the same representatives (the cutoff keeps a PREFIX of the same
    md5 order the window ranks by)."""
    rows = [(i, f"s{i % 2}", "x") for i in range(80)]
    a = {(r.doc_id, r.rank_in_source) for r in cap_per_source(_docs(spark, rows), cap=4).collect()}
    b = {(r.doc_id, r.rank_in_source) for r in cap_per_source(_docs(spark, rows), cap=4).collect()}
    c = {(r.doc_id, r.rank_in_source) for r in cap_per_source(_docs(spark, rows), cap=4, prefilter_margin=3).collect()}
    assert a == b == c
    assert len(a) == 8


# --------------------------------------------------------------------------
# duplicate_spans
# --------------------------------------------------------------------------

def test_duplicate_spans_flags_cross_doc_repeats(spark):
    shared = "a b c d e f g h"  # exactly one 8-gram window
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 tail1"),
            (2, shared + " unique2 tail2"),
            (3, "totally different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_spans(docs, n=8).collect()}
    # docs 1/2: 10 words -> 3 windows each; only the shared window
    # (positions 1) duplicates across docs
    assert out[1].n_spans == 3 and out[1].n_dup_spans == 1
    assert out[2].n_spans == 3 and out[2].n_dup_spans == 1
    assert out[3].n_spans == 2 and out[3].n_dup_spans == 0
    assert out[1].dup_frac == pytest.approx(1 / 3)


def test_duplicate_spans_within_doc_repeat_not_flagged(spark):
    """A gram repeated only INSIDE one doc is repetition, not cross-doc
    duplication (that's repetition_stats' signal)."""
    text = "a b c d e f g h " * 2  # the 8-gram 'a..h' occurs twice in doc 1
    docs = spark.createDataFrame(
        [(1, text.strip()), (2, "nothing shared here beyond eight words total")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_spans(docs, n=8).collect()}
    assert out[1].n_dup_spans == 0
    assert out[2].n_dup_spans == 0


def test_duplicate_spans_short_docs_zero(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in duplicate_spans(docs, n=8).collect()}
    assert out[1].n_spans == 0 and out[1].dup_frac == 0.0
    assert out[2].n_spans == 0 and out[2].dup_frac == 0.0


# --------------------------------------------------------------------------
# snapshot_delta / entity_cards
# --------------------------------------------------------------------------

_TRIPLE_COLS = (
    "subject string, predicate string, object string, label string,"
    " datatype string, objecttype string"
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, _TRIPLE_COLS)


def test_snapshot_delta_adds_and_removes(spark):
    old = _triples(
        spark,
        [
            ("s1", "p1", "o1", "", "", "iri"),
            ("s2", "p1", "o2", "", "", "iri"),
            ("s3", "p2", "lit", "", "", "literal"),
        ],
    )
    new = _triples(
        spark,
        [
            ("s1", "p1", "o1", "", "", "iri"),  # unchanged
            ("s4", "p1", "o9", "", "", "iri"),  # added under p1
            ("s3", "p2", "lit", "en", "", "literal"),  # label change = rem+add
        ],
    )
    out = {r.predicate: r for r in snapshot_delta(old, new).collect()}
    assert out["p1"].n_added == 1 and out["p1"].n_removed == 1
    assert out["p2"].n_added == 1 and out["p2"].n_removed == 1


def test_snapshot_delta_duplicates_collapse(spark):
    """Snapshots compare as DISTINCT triples: the same assertion from
    two documents is one logical triple."""
    old = _triples(spark, [("s", "p", "o", "", "", "iri")] * 3)
    new = _triples(spark, [("s", "p", "o", "", "", "iri")])
    assert snapshot_delta(old, new).count() == 0


def test_entity_cards_counts_and_blank_subjects_excluded(spark):
    t = _triples(
        spark,
        [
            ("e1", "p1", "lit", "", "", "literal"),
            ("e1", "p1", "e2", "", "", "iri"),
            ("e1", "p2", "_:b0", "", "", "iri"),  # blank link: not a link
            ("_:b0", "p1", "lit", "", "", "literal"),  # blank subject: no card
        ],
    )
    out = {r.subject: r for r in entity_cards(t).collect()}
    assert set(out) == {"e1"}
    card = out["e1"]
    assert card.n_triples == 3
    assert card.n_predicates == 2
    assert card.n_literals == 1
    assert card.n_links == 1


def test_entity_cards_bag_semantics(spark):
    """The same triple asserted twice counts twice (provenance weight)
    and its fingerprint XOR-cancels back to the unseen-pair state."""
    once = entity_cards(
        _triples(spark, [("e", "p", "o", "", "", "iri")])
    ).collect()[0]
    twice = entity_cards(
        _triples(spark, [("e", "p", "o", "", "", "iri")] * 2)
    ).collect()[0]
    assert twice.n_triples == 2 * once.n_triples
    assert once.card_fp != 0 and twice.card_fp == 0  # x ^ x == 0


# --------------------------------------------------------------------------
# substring_clean (duplicated-span removal)
# --------------------------------------------------------------------------

def test_substring_clean_hand_built(spark):
    # doc 0 and doc 1 share the 4-gram "a b c d" (positions 1 in both);
    # doc 2 repeats "p q r s" twice WITHIN itself (within-doc repeat
    # counts); doc 3 is clean.
    rows = [
        (0, "src", "a b c d x y z w"),
        (1, "src", "q a b c d k l m"),
        (2, "src", "p q r s p q r s"),
        (3, "src", "u v w x u2 v2 w2 x2"),
    ]
    from turtle_spark.operators.dedup import substring_clean

    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r
        for r in substring_clean(df, k=4).orderBy("doc_id").collect()
    }
    # doc 0: window at pos 1 ("a b c d") duplicated -> tokens 1-4 removed
    assert out[0]["n_dup_windows"] == 1 and out[0]["removed_tokens"] == 4
    assert out[0]["cleaned_text"] == "x y z w"
    # doc 1: same gram at pos 2 -> tokens 2-5 removed
    assert out[1]["removed_tokens"] == 4
    assert out[1]["cleaned_text"] == "q k l m"
    # doc 2: windows at pos 1 and pos 5 both read "p q r s" (within-doc
    # repeat, occ=2). They are CONTIGUOUS (pos 5 = prev 1 + k) so they
    # merge into ONE span covering the whole doc.
    assert out[2]["n_dup_windows"] == 2 and out[2]["n_spans"] == 1
    assert out[2]["removed_tokens"] == 8 and out[2]["cleaned_text"] == ""
    assert out[2]["removed_frac"] == 1.0
    # doc 3: nothing duplicated
    assert out[3]["removed_tokens"] == 0
    assert out[3]["cleaned_text"] == "u v w x u2 v2 w2 x2"


def test_substring_clean_overlap_merges(spark):
    # the shared run is 5 tokens long -> two OVERLAPPING dup windows
    # (pos 1 and pos 2) merge into one 5-token span
    rows = [
        (0, "a b c d e x x1 x2 x3"),
        (1, "y a b c d e z z1 z2"),
    ]
    from turtle_spark.operators.dedup import substring_clean

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in substring_clean(df, k=4).orderBy("doc_id").collect()
    }
    assert out[0]["n_dup_windows"] == 2 and out[0]["n_spans"] == 1
    assert out[0]["removed_tokens"] == 5
    assert out[0]["cleaned_text"] == "x x1 x2 x3"
    assert out[1]["cleaned_text"] == "y z z1 z2"


def test_substring_clean_empty_and_short_docs(spark):
    rows = [(0, "   "), (1, "a b"), (2, "")]
    from turtle_spark.operators.dedup import substring_clean

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = substring_clean(df, k=4).orderBy("doc_id").collect()
    assert [r["n_tokens"] for r in out] == [0, 2, 0]
    assert all(r["removed_tokens"] == 0 for r in out)
    assert all(r["removed_frac"] == 0.0 for r in out)
