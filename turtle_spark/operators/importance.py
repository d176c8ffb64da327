"""Corpus importance scoring: quantized LM quality + DSIR weights.

Two public-literature data-selection signals for LLM pipelines:

* ``lm_quality`` — the CCNet-family language-model quality filter
  (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  Datasets"): score each document by how familiar its character
  trigrams are to a model trained on a trusted slice of the corpus.
* ``dsir_weights`` — Data Selection via Importance Resampling (Xie
  et al. 2023): per-document importance weight log p_target/q_raw
  over hashed n-gram buckets, target = a trusted sub-distribution,
  raw = the whole corpus.

Determinism: both methods natively sum log-probabilities, but
transcendental ``log`` is not correctly rounded and differs across
libm implementations — a cross-engine fingerprint would be flaky.
Scores here use the integer QUANTIZED log2 ``bit_length(1 + count) -
1`` (floor log2): every addend is an exact integer on any engine, the
final per-document normalization is one IEEE-exact division, and the
ranking the filters act on is preserved (floor-log2 is monotone in
the count).  This is a documented engineering quantization of the
published methods, not a new scoring function.

Scale notes: each model is ONE aggregation whose key space is bounded
(trigram alphabet / 4096 hash buckets), broadcast back for the
scoring join; scoring itself is a narrow explode + one per-document
aggregation.  No Python anywhere; no driver collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DSIR_BUCKETS = 4096


def _trigrams_of(lowered_col: str) -> F.Column:
    """Array of character trigrams of an ALREADY-LOWERCASED column
    (empty when shorter than 3 chars — sequence() would otherwise
    count DOWN and fabricate windows).  Takes the materialized column
    by name: referencing ``lower(text)`` inline would re-lowercase the
    whole string once PER TRIGRAM inside the transform lambda (lambda
    bodies are re-evaluated per element, no common-subexpression
    elimination across them) — O(len²) character copies per doc."""
    return F.expr(
        f"CASE WHEN char_length({lowered_col}) >= 3 THEN "
        f"transform(sequence(1, char_length({lowered_col}) - 2),"
        f" i -> substring({lowered_col}, i, 3)) "
        "ELSE CAST(array() AS array<string>) END"
    )


def _word_bigrams_of(words_col: str) -> F.Column:
    """Array of word bigrams ('a b') from an ALREADY-MATERIALIZED
    words-array column.  ``zip_with`` over two slices touches each
    word once; the previous inline form re-ran ``regexp_extract_all``
    over the full text once per bigram element (same lambda
    re-evaluation trap as ``_trigrams_of``) — measured 24.5 s -> ~3 s
    for q_dsir_weights at sf0.1."""
    return F.expr(
        f"CASE WHEN size({words_col}) >= 2 THEN "
        f"zip_with(slice({words_col}, 1, size({words_col}) - 1),"
        f" slice({words_col}, 2, size({words_col}) - 1),"
        f" (a, b) -> concat(a, ' ', b)) "
        "ELSE CAST(array() AS array<string>) END"
    )


# floor(log2(1 + c)) as an exact integer: length of the binary string
_QLOG = "length(bin(1 + coalesce({c}, 0L))) - 1"


def lm_quality(
    docs: DataFrame,
    train_mod: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quantized trigram-LM quality score for every non-training doc.

    The model trains on the deterministic slice ``doc_id % train_mod
    == 0`` (the 'trusted' corpus stand-in); every other document gets
    (n_grams, score_num, n_oov, lm_q = score_num / n_grams).  Higher
    = more familiar; OOV grams contribute 0.
    """
    grams = docs.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("_lt")
    ).select(F.col(id_col), F.explode(_trigrams_of("_lt")).alias("gram"))
    model = (
        grams.where(F.col(id_col) % train_mod == 0)
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
    )
    score = grams.where(F.col(id_col) % train_mod != 0)
    joined = score.join(F.broadcast(model), "gram", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.sum(F.expr(_QLOG.format(c="cnt"))).alias("score_num"),
        F.sum(F.when(F.col("cnt").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "score_num",
        "n_oov",
        (F.col("score_num").cast("double") / F.col("n_grams").cast("double")).alias(
            "lm_q"
        ),
    )


def dsir_weights(
    docs: DataFrame,
    target_filter: F.Column,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quantized DSIR importance weight for every document.

    ``target_filter`` selects the target sub-distribution (e.g.
    ``F.col("lang") == "en"``).  Word bigrams hash into ``n_buckets``
    buckets; weight_num sums floor_log2(1+target_count) -
    floor_log2(1+raw_count) per bigram occurrence, and ``dsir_w``
    normalizes by the document's bigram count.
    """
    grams = (
        docs.select(
            F.col(id_col),
            target_filter.alias("_is_target"),
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)").alias("_w"),
        )
        .select(
            F.col(id_col), "_is_target",
            F.explode(_word_bigrams_of("_w")).alias("bg"),
        )
        .withColumn("bucket", F.pmod(F.xxhash64("bg"), F.lit(n_buckets)))
    )
    # both the model build and the scoring join consume grams — pin so
    # the tokenize+explode subtree runs once, not once per consumer
    from turtle_spark.operators.skew import pin

    grams = pin(grams)
    model = grams.groupBy("bucket").agg(
        F.count("*").alias("raw_cnt"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("tgt_cnt"),
    )
    joined = grams.join(F.broadcast(model), "bucket")
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum(
            F.expr(_QLOG.format(c="tgt_cnt")) - F.expr(_QLOG.format(c="raw_cnt"))
        ).alias("weight_num"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        "weight_num",
        (
            F.col("weight_num").cast("double") / F.col("n_bigrams").cast("double")
        ).alias("dsir_w"),
    )
