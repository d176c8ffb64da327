"""BPE trainer (operators/bpe.py): merge ordering, tie-breaks, greedy
merge application, the skew guard, and partitioning independence.
The sf-scale merge table is pinned against an independent Counter
trainer by test_oracle_parity[q_bpe_vocab]."""

from __future__ import annotations

import pytest

from turtle_spark.operators.bpe import bpe_word_counts, train_bpe


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            ("low low low lower lowest newer newest",),
            ("wider new newer widest low",),
        ],
        "text string",
    )


def test_classic_merge_sequence(corpus):
    merges = train_bpe(corpus, n_merges=4)
    # 'lo' (6 in low/lower/lowest x4+1+1) wins, then chains to 'low';
    # 'er'/'ew' tie at 4 -> lexicographic ('e','r') < ('e','w')
    assert [(m[1], m[2]) for m in merges] == [
        ("l", "o"), ("lo", "w"), ("e", "r"), ("e", "w"),
    ]
    assert merges[0][3] == "lo" and merges[0][4] == 6
    assert merges[1][3] == "low"


def test_overlapping_pairs_merge_left_greedy(spark):
    # 'aaa' -> pair (a,a) counts both overlaps (weight 2); the merge
    # rewrites left-greedily to [aa, a, </w>], never [a, aa]
    docs = spark.createDataFrame([("aaa aaa",)], "text string")
    merges = train_bpe(docs, n_merges=2)
    assert (merges[0][1], merges[0][2], merges[0][4]) == ("a", "a", 4)
    # second merge sees [aa, a, </w>]: candidates (aa,a) and (a,</w>)
    assert (merges[1][1], merges[1][2]) == ("a", "</w>")


def test_word_length_skew_guard(spark):
    docs = spark.createDataFrame([("ab " + "x" * 100,)], "text string")
    toks = bpe_word_counts(docs, max_word_len=64).collect()
    assert len(toks) == 1 and toks[0]["toks"] == ["a", "b", "</w>"]


def test_partitioning_independence(corpus):
    a = train_bpe(corpus, n_merges=6)
    b = train_bpe(corpus.repartition(9), n_merges=6)
    assert a == b


def test_distributed_loop_matches_driver_tail(corpus):
    # local_cutoff=0 forces the distributed per-iteration loop; the
    # result must be bit-identical to the driver tail
    a = train_bpe(corpus, n_merges=6, local_cutoff=0)
    b = train_bpe(corpus, n_merges=6)
    assert a == b


def test_early_stop_when_fully_merged(spark):
    docs = spark.createDataFrame([("ab ab",)], "text string")
    merges = train_bpe(docs, n_merges=10)
    # ab</w> fully merges in 2 steps; trainer stops, no padding rows
    assert len(merges) == 2
    assert merges[-1][3] == "ab</w>"


def test_encode_applies_merges_in_rank_order(spark, corpus):
    from turtle_spark.operators.bpe import bpe_encode

    merges = train_bpe(corpus, n_merges=4)
    enc = bpe_encode(
        spark.createDataFrame([("low lowest zz",)], "text string"), merges
    ).collect()[0]["bpe_tokens"]
    # low -> [low, </w>]; lowest -> [low, e, s, t, </w>] ('es'/'est'
    # never learned in 4 merges); zz unseen -> chars + marker
    assert enc == ["low", "</w>", "low", "e", "s", "t", "</w>", "z", "z", "</w>"]


def test_encode_long_word_passthrough(spark, corpus):
    from turtle_spark.operators.bpe import bpe_encode

    merges = train_bpe(corpus, n_merges=2)
    long_word = "y" * 100
    enc = bpe_encode(
        spark.createDataFrame([(f"low {long_word}",)], "text string"), merges
    ).collect()[0]["bpe_tokens"]
    assert enc[-1] == long_word  # opaque single token, no char split
