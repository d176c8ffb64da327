"""Unit ground truth for the curation operators (PII redaction,
repetition stats, benchmark decontamination) on literal fixtures —
independent of the parquet corpus and of the oracle mirror."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turtle_spark.operators.curation import (
    decontaminate,
    pii_redact,
    repetition_stats,
    split_corpus,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPiiRedact:
    def test_redacts_and_counts(self, spark):
        rows = [
            (1, "mail alice.smith+x@example.co.uk now"),
            (2, "server at 10.0.255.7 responded"),
            (3, "call 555-867-5309 today"),
            (4, "mix a@b.io and 1.2.3.4 and 555-000-1111"),
            (5, "clean text with no pii at all"),
        ]
        out = {
            r["doc_id"]: r
            for r in pii_redact(_docs(spark, rows)).collect()
        }
        assert out[1]["n_emails"] == 1 and out[1]["redacted_text"] == "mail <EMAIL> now"
        assert out[2]["n_ipv4"] == 1 and out[2]["redacted_text"] == "server at <IP> responded"
        assert out[3]["n_phones"] == 1 and out[3]["redacted_text"] == "call <PHONE> today"
        assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_phones"]) == (1, 1, 1)
        assert out[4]["redacted_text"] == "mix <EMAIL> and <IP> and <PHONE>"
        assert out[5]["redacted_text"] == rows[4][1]
        assert (out[5]["n_emails"], out[5]["n_ipv4"], out[5]["n_phones"]) == (0, 0, 0)

    def test_email_wins_over_inner_patterns(self, spark):
        # the local part contains a phone-shaped digit run; email is
        # redacted first so no <PHONE> appears inside the token
        rows = [(1, "odd 555-123-4567@weird.org address")]
        r = pii_redact(_docs(spark, rows)).collect()[0]
        assert r["redacted_text"] == "odd <EMAIL> address"
        assert r["n_emails"] == 1

    def test_no_shuffle_plan(self, spark):
        plan = pii_redact(
            _docs(spark, [(1, "x")])
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestRepetitionStats:
    def test_ground_truth(self, spark):
        rows = [
            (1, "a a a a"),          # 1 distinct word, 3 identical bigrams
            (2, "a b c d"),          # all distinct
            (3, "a b a b a"),        # bigrams: ab ba ab ba -> 2 distinct of 4
            (4, ""),                 # empty doc
            (5, "solo"),             # one word, no bigrams
        ]
        out = {
            r["doc_id"]: r for r in repetition_stats(_docs(spark, rows)).collect()
        }
        assert out[1]["n_words"] == 4
        assert out[1]["distinct_word_ratio"] == 0.25
        assert out[1]["top_word_ratio"] == 1.0
        assert out[1]["dup_bigram_ratio"] == pytest.approx(1 - 1 / 3, abs=1e-6)
        assert out[2]["distinct_word_ratio"] == 1.0
        assert out[2]["top_word_ratio"] == 0.25
        assert out[2]["dup_bigram_ratio"] == 0.0
        assert out[3]["top_word_ratio"] == 0.6
        assert out[3]["dup_bigram_ratio"] == 0.5
        assert out[4]["n_words"] == 0
        assert out[4]["distinct_word_ratio"] == 0.0
        assert out[4]["top_word_ratio"] == 0.0
        assert out[4]["dup_bigram_ratio"] == 0.0
        assert out[5]["n_words"] == 1
        assert out[5]["dup_bigram_ratio"] == 0.0


class TestDecontaminate:
    def test_word_ngrams_distinct_per_doc(self, spark):
        rows = [(1, "a b a b a b")]  # 3-grams: aba bab aba bab -> 2 distinct
        grams = sorted(
            r["gram"] for r in word_ngrams(_docs(spark, rows), 3).collect()
        )
        assert grams == ["a b a", "b a b"]

    def test_flags_only_overlapping_docs(self, spark):
        bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
        train = _docs(
            spark,
            [
                # shares the 4-gram "quick brown fox jumps"
                (1, "saw the quick brown fox jumps over fences"),
                # same words, different order -> no shared 4-gram
                (2, "fox brown quick the dog lazy over jumps"),
                (3, "completely unrelated text goes here now"),
            ],
        )
        out = {
            r["doc_id"]: r for r in decontaminate(train, bench, n=4).collect()
        }
        assert out[1]["contaminated"] and out[1]["n_hits"] >= 1
        assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
        assert not out[3]["contaminated"]
        assert len(out) == 3  # every train doc present, clean ones included

    def test_broadcast_no_corpus_shuffle(self, spark):
        bench = _docs(spark, [(100, "p q r s t")])
        train = _docs(spark, [(1, "p q r s t u v")])
        plan = (
            decontaminate(train, bench, n=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_split_corpus_partitions_exactly(self, spark):
        docs = _docs(spark, [(i, f"doc {i}") for i in range(200)])
        train, bench = split_corpus(docs, 0.1)
        t = {r["doc_id"] for r in train.select("doc_id").collect()}
        b = {r["doc_id"] for r in bench.select("doc_id").collect()}
        assert t | b == set(range(200))
        assert t & b == set()
        assert 0 < len(b) < 60  # ~10% of 200, hash variance allowed


class TestQueryPlans:
    def test_repetition_stats_shuffles_keyed_by_doc(self, spark):
        docs = _docs(spark, [(1, "a b c"), (2, "d e f")])
        plan = (
            repetition_stats(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the mode-count aggregation is the only exchange producer;
        # the narrow array stats must not add shuffles of their own
        assert plan.count("Exchange") <= 3


class TestLineDedup:
    def test_boilerplate_removed_everywhere(self, spark):
        import hashlib

        rows = [
            (1, "COOKIE BANNER\nreal content one\nCOOKIE BANNER"),
            (2, "COOKIE BANNER\nreal content two"),
            (3, "  COOKIE BANNER  \nunique line"),
            (4, "nothing shared here\n\ntrailing empty kept"),
        ]
        from turtle_spark.operators.curation import line_dedup

        out = {
            r["doc_id"]: r
            for r in line_dedup(_docs(spark, rows), min_docs=3).collect()
        }
        # the banner occurs in 3 distinct docs -> every occurrence
        # (including the space-padded one) drops; order preserved
        assert (out[1]["n_lines"], out[1]["n_removed"]) == (3, 2)
        assert out[1]["clean_md5"] == hashlib.md5(b"real content one").hexdigest()
        assert (out[2]["n_lines"], out[2]["n_removed"]) == (2, 1)
        assert (out[3]["n_lines"], out[3]["n_removed"]) == (2, 1)
        assert out[3]["clean_md5"] == hashlib.md5(b"unique line").hexdigest()
        # empty lines are never boilerplate and survive in place
        assert (out[4]["n_lines"], out[4]["n_removed"]) == (3, 0)
        assert out[4]["clean_len"] == len("nothing shared here\n\ntrailing empty kept")

    def test_all_lines_removed_yields_empty_md5(self, spark):
        import hashlib

        from turtle_spark.operators.curation import line_dedup

        rows = [(1, "x"), (2, "x"), (3, "x")]
        out = {
            r["doc_id"]: r
            for r in line_dedup(_docs(spark, rows), min_docs=3).collect()
        }
        assert out[1]["n_removed"] == 1 and out[1]["clean_len"] == 0
        assert out[1]["clean_md5"] == hashlib.md5(b"").hexdigest()

    def test_source_scope_limits_dictionary(self, spark):
        from turtle_spark.operators.curation import line_dedup

        docs = spark.createDataFrame(
            [
                (1, "promo\nkeep a", "siteA"),
                (2, "promo\nkeep b", "siteA"),
                (3, "promo\nkeep c", "siteB"),
            ],
            "doc_id long, text string, source string",
        )
        out = {
            r["doc_id"]: r
            for r in line_dedup(docs, min_docs=2, source_col="source").collect()
        }
        # 'promo' clears min_docs only within siteA; siteB keeps it
        assert out[1]["n_removed"] == 1 and out[2]["n_removed"] == 1
        assert out[3]["n_removed"] == 0

    def test_no_raw_line_broadcast_in_plan(self, spark):
        from turtle_spark.operators.curation import line_dedup

        docs = _docs(spark, [(1, "a\nb"), (2, "a\nc"), (3, "a")])
        plan = (
            line_dedup(docs, min_docs=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # removal joins on fixed-width md5 keys, never raw line text
        assert "LeftAnti" in plan or "left_anti" in plan.lower()


def test_normalize_text_ground_truth(spark):
    from turtle_spark.operators.curation import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "café ​plus﻿"),       # NFD + zero-width junk
            (2, "a\r\nb\rc"),                          # CRLF / CR folding
            (3, "x\x07y\tz   w"),                      # control + ws runs
            (4, "  already clean  "),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["norm_text"], r["changed"])
           for r in normalize_text(docs).collect()}
    assert got[1] == ("café plus", True)
    assert got[2] == ("a\nb\nc", True)
    assert got[3] == ("xy z w", True)
    assert got[4] == ("already clean", True)
    assert got[5][0] is None


def test_compression_ratio_orders_redundancy(spark):
    from turtle_spark.operators.curation import compression_ratio

    rows = [
        (0, "spam " * 400),                      # highly redundant
        (1, " ".join(str(i * 7919 % 9973) for i in range(400))),  # high entropy
        (2, ""),
        (3, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert out[0]["compression_ratio"] < 0.05
    assert out[1]["compression_ratio"] > 0.4
    assert out[2]["n_bytes"] == 0 and out[2]["compression_ratio"] == 0.0
    # whitespace-only still compresses (non-empty bytes)
    assert out[3]["n_bytes"] == 3 and out[3]["n_compressed"] > 0
    import zlib

    assert out[1]["n_compressed"] == len(
        zlib.compress(rows[1][1].encode("utf-8"), 6)
    )


def test_compression_ratio_batch_shape_independent(spark):
    from turtle_spark.operators.curation import compression_ratio

    rows = [(i, f"doc {i} " * (i % 17 + 1)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    one = sorted(map(tuple, compression_ratio(df.coalesce(1)).collect()))
    many = sorted(map(tuple, compression_ratio(df.repartition(13)).collect()))
    assert one == many
