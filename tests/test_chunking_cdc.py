"""Unit tests for the chunking / TF-IDF / CDC-compaction / corpus-filter
operators (their oracle parity is covered by test_oracle_parity.py; these
pin the operator semantics on hand-built inputs)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from turtle_spark.operators.cdc import latest_by_key
from turtle_spark.operators.chunking import chunk_documents
from turtle_spark.operators.textstats import tfidf_keywords, training_filter


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


class TestChunking:
    def test_sliding_windows_cover_and_overlap(self, spark):
        words = [f"w{i}" for i in range(10)]
        docs = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        out = (
            chunk_documents(docs, chunk_tokens=4, stride=3, with_text=True)
            .orderBy("chunk_idx")
            .collect()
        )
        # starts 0,3,6 cover tokens 0..9; last chunk is the 4-token
        # window starting at 6 (exactly reaches the end)
        assert [r["chunk_idx"] for r in out] == [0, 1, 2]
        assert [r["n_tokens"] for r in out] == [4, 4, 4]
        assert out[0]["chunk_text"] == "w0 w1 w2 w3"
        assert out[1]["chunk_text"] == "w3 w4 w5 w6"
        assert out[2]["chunk_text"] == "w6 w7 w8 w9"
        assert out[0]["chunk_hash"] == _md5("w0 w1 w2 w3")

    def test_short_tail_chunk(self, spark):
        docs = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(11)))],
            "doc_id long, text string",
        )
        out = (
            chunk_documents(docs, chunk_tokens=4, stride=3, with_text=True)
            .orderBy("chunk_idx")
            .collect()
        )
        # 11 tokens -> starts 0,3,6,9; last chunk holds only w9 w10
        assert [r["n_tokens"] for r in out] == [4, 4, 4, 2]
        assert out[-1]["chunk_text"] == "w9 w10"

    def test_short_doc_single_chunk(self, spark):
        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        out = chunk_documents(docs, chunk_tokens=64, stride=48).collect()
        assert len(out) == 1
        assert out[0]["n_tokens"] == 2

    def test_whitespace_only_doc_yields_nothing(self, spark):
        docs = spark.createDataFrame(
            [(1, "   "), (2, "")], "doc_id long, text string"
        )
        assert chunk_documents(docs).count() == 0

    def test_bad_params_rejected(self, spark):
        docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_tokens=0)
        with pytest.raises(ValueError):
            chunk_documents(docs, stride=0)


class TestTfidfKeywords:
    def test_hand_computed_scores(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "apple apple banana"),
                (2, "banana cherry"),
                (3, "cherry cherry cherry"),
            ],
            "doc_id long, text string",
        )
        out = {
            (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"], r["score"])
            for r in tfidf_keywords(docs, top_k=2).collect()
        }
        # doc 1: apple tf=2 df=1 -> 2.0; banana tf=1 df=2 -> 0.5
        assert out[(1, 1)] == ("apple", 2, 1, 2.0)
        assert out[(1, 2)] == ("banana", 1, 2, 0.5)
        # doc 3: cherry tf=3 df=2 -> 1.5
        assert out[(3, 1)] == ("cherry", 3, 2, 1.5)
        # doc 2: both terms score 0.5 -> alphabetical tiebreak
        assert out[(2, 1)][0] == "banana"
        assert out[(2, 2)][0] == "cherry"


class TestLatestByKey:
    def test_latest_wins_with_tiebreak(self, spark):
        log = spark.createDataFrame(
            [
                (1, "a", 10, 100, 1.0),
                (1, "a", 11, 200, 2.0),   # newest ts -> wins
                (1, "b", 12, 200, 3.0),
                (1, "b", 13, 200, 4.0),   # same ts, higher id -> wins
                (2, "a", 14, 50, 5.0),
            ],
            "user_id long, event_type string, event_id long, ts long, value double",
        )
        out = {
            (r["user_id"], r["event_type"]): (r["event_id"], r["value"])
            for r in latest_by_key(
                log, keys=["user_id", "event_type"], version_cols=["ts", "event_id"]
            ).collect()
        }
        assert out == {(1, "a"): (11, 2.0), (1, "b"): (13, 4.0), (2, "a"): (14, 5.0)}

    def test_empty_spec_rejected(self, spark):
        log = spark.createDataFrame([(1, 1)], "k long, v long")
        with pytest.raises(ValueError):
            latest_by_key(log, keys=[], version_cols=["v"])
        with pytest.raises(ValueError):
            latest_by_key(log, keys=["k"], version_cols=[])


class TestTrainingFilter:
    def test_funnel_stages(self, spark):
        good = (
            "the quick brown fox and the lazy dog of the north "
            "went over the hill and the river of stories " * 2
        )
        docs = spark.createDataFrame(
            [
                (1, good),                       # survives
                (2, good),                       # exact dup of 1 -> dropped
                (3, "der hund und die katze und die maus der die und " * 4),  # German
                (4, "the of and " * 2),          # too few tokens
                (5, " and ".join(["#### @@@@ <<<> 1234 %%%% " * 4] * 3)),  # en, but symbol soup tanks quality
            ],
            "doc_id long, text string",
        )
        rows = training_filter(
            docs, min_score=0.45, min_tokens=10, max_tokens=1000
        ).collect()
        assert [r["doc_id"] for r in rows] == [1]
        assert rows[0]["pred_lang"] == "en"

    def test_single_scan_no_joins(self, spark):
        docs = spark.createDataFrame([(1, "the cat and dog")], "doc_id long, text string")
        plan = training_filter(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan


class TestPackSequences:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_next_fit_within_bucket(self, spark):
        from turtle_spark.operators.chunking import pack_sequences

        # single bucket => pure next-fit in id order
        docs = self._docs(
            spark,
            [
                (1, "a b c"),          # 3 tokens
                (2, "d e"),            # 2 -> pack 0 full at 5
                (3, "f g h"),          # 3 > cap-5 => new pack
                (4, " "),              # whitespace-only: dropped
                (5, "i j"),            # fits pack 1 (3+2=5)
            ],
        )
        out = {
            r["doc_id"]: (r["pack_id"], r["pack_pos"], r["n_tokens"])
            for r in pack_sequences(docs, max_tokens=5, n_buckets=1).collect()
        }
        assert set(out) == {1, 2, 3, 5}
        assert out[1] == (0, 0, 3)
        assert out[2] == (0, 1, 2)
        assert out[3] == (1, 0, 3)
        assert out[5] == (1, 1, 2)

    def test_oversize_gets_own_pack(self, spark):
        from turtle_spark.operators.chunking import pack_sequences

        docs = self._docs(
            spark, [(1, "a b"), (2, "x " * 10), (3, "c d")]
        )
        out = {
            r["doc_id"]: (r["pack_id"], r["pack_pos"])
            for r in pack_sequences(docs, max_tokens=4, n_buckets=1).collect()
        }
        packs = {out[1][0], out[2][0], out[3][0]}
        assert len(packs) == 3  # oversize doc 2 split packs 1 and 3 apart
        assert out[2][1] == 0

    def test_parallelism_independent(self, spark):
        from turtle_spark.operators.chunking import pack_sequences

        docs = self._docs(
            spark, [(i, "w " * (i % 7 + 1)) for i in range(200)]
        )
        a = sorted(
            map(tuple, pack_sequences(docs, 32, n_buckets=8).collect())
        )
        b = sorted(
            map(
                tuple,
                pack_sequences(docs.repartition(13), 32, n_buckets=8).collect(),
            )
        )
        assert a == b

    def test_fill_never_exceeds_budget(self, spark):
        from turtle_spark.operators.chunking import pack_sequences
        from pyspark.sql import functions as F

        docs = self._docs(
            spark, [(i, "w " * (i % 9 + 1)) for i in range(100)]
        )
        out = pack_sequences(docs, max_tokens=12, n_buckets=4)
        fills = (
            out.where(F.col("n_tokens") <= 12)
            .groupBy("pack_id")
            .agg(F.sum("n_tokens").alias("fill"))
        )
        assert fills.where(F.col("fill") > 12).count() == 0


def test_scd2_history_hand_built(spark):
    import datetime as dt

    from turtle_spark.operators.cdc import scd2_history

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: A, A (collapse), B, A — three intervals
        (1, 1, base + dt.timedelta(hours=0), "A"),
        (2, 1, base + dt.timedelta(hours=1), "A"),
        (3, 1, base + dt.timedelta(hours=2), "B"),
        (4, 1, base + dt.timedelta(hours=3), "A"),
        # user 2: one state, always current
        (5, 2, base, "X"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, state string"
    )
    out = (
        scd2_history(df, ["user_id"], ["state"], ["ts", "event_id"])
        .orderBy("user_id", "valid_from")
        .collect()
    )
    u1 = [r for r in out if r["user_id"] == 1]
    assert [(r["state"], r["is_current"]) for r in u1] == [
        ("A", False), ("B", False), ("A", True)
    ]
    assert u1[0]["valid_from"] == base
    assert u1[0]["valid_to"] == base + dt.timedelta(hours=2)  # run of 2 A's
    assert u1[1]["valid_to"] == base + dt.timedelta(hours=3)
    assert u1[2]["valid_to"] is None
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"]


def test_scd2_null_transitions_and_invariance(spark):
    import datetime as dt

    from turtle_spark.operators.cdc import scd2_history

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base + dt.timedelta(hours=0), None),
        (2, 1, base + dt.timedelta(hours=1), None),   # null run collapses
        (3, 1, base + dt.timedelta(hours=2), "A"),
        (4, 1, base + dt.timedelta(hours=3), None),   # null is a real state
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, state string"
    )
    out = scd2_history(df, ["user_id"], ["state"], ["ts", "event_id"])
    states = [r["state"] for r in out.orderBy("valid_from").collect()]
    assert states == [None, "A", None]
    key = lambda rows: sorted(
        (r["user_id"], r["valid_from"], str(r["state"]), r["valid_to"], r["is_current"])
        for r in rows
    )
    one = key(scd2_history(df.coalesce(1), ["user_id"], ["state"], ["ts", "event_id"]).collect())
    many = key(scd2_history(df.repartition(5), ["user_id"], ["state"], ["ts", "event_id"]).collect())
    assert one == many
