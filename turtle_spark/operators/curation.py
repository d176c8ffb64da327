"""Corpus-curation operators for training-data pipelines: PII
redaction, repetition-based quality filters (the Gopher rules), and
benchmark decontamination.

Like the rest of the text stack these are pure column expressions —
whole-stage codegen, no Python in the hot path — and every function
sticks to constructs with identical semantics in DuckDB (character
classes legal in both Java regex and RE2, ``md5``, list/array
higher-order functions) so the driver's oracle can compare exactly.

Scale notes per operator are in the docstrings; the common theme is
that curation is a *narrow map over the scan* (redaction, repetition
stats) or a *broadcast semi-join against a tiny reference set*
(decontamination) — nothing here shuffles the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from turtle_spark.operators.sampling import sample_hash

# PII patterns — shared with the SQL oracle verbatim.  Only constructs
# that Java regex and RE2 treat identically: character classes, bounded
# repetition, the ASCII word boundary \b.  No lookaround, no backrefs
# (RE2 has neither).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"

# Redaction order is part of the spec: emails first (their local/domain
# parts may contain digit runs and dots that the IP/phone patterns
# would otherwise bite into), then IPs, then phones.  The replacement
# tokens contain no digits, so later passes never match inside them.
_REDACTIONS = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def pii_redact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Detect and redact emails / IPv4 addresses / phone numbers.

    Returns per document: match counts per PII class (counted on the
    ORIGINAL text, independent of redaction order) plus the redacted
    text and its md5 (the hash lets an oracle verify the full redacted
    string without hauling it around).

    Scale: a narrow projection over the scan — zero shuffles, zero
    Python; regex matching runs in whole-stage codegen.  At 100 TB this
    is scan-bound, exactly what a curation pass should be.
    """
    c = F.col(text_col)
    redacted = c
    for pattern, token in _REDACTIONS:
        redacted = F.regexp_replace(redacted, pattern, token)
    return docs.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(c, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        redacted.alias("redacted_text"),
        F.md5(redacted).alias("redacted_md5"),
    )


def _words(text_col: str) -> F.Column:
    """Whitespace tokens; '' -> empty array (split would yield [''])."""
    c = F.trim(F.col(text_col))
    return F.when(F.length(c) == 0, F.expr("CAST(array() AS array<string>)")).otherwise(
        F.split(c, r"\s+")
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    ``distinct_word_ratio``  |vocab(doc)| / n_words  (low = repetitive)
    ``top_word_ratio``       count(mode word) / n_words
    ``dup_bigram_ratio``     1 − distinct_bigrams / n_bigrams

    Plan shape: the array-derivable stats (distinct words, bigram
    duplication) are a NARROW map — ``array_distinct`` over the split,
    bigrams via ``transform(sequence(...))``, no shuffle.  Only the
    mode count needs an aggregation: explode → (doc, word) hash agg →
    per-doc max, i.e. two shuffles both keyed by doc_id — map-side
    combine collapses the heavy repetition before the exchange, and the
    final join back to the narrow side broadcasts nothing big because
    the aggregated side is one row per document.  Empty documents get
    ratio 0 across the board (no division by zero, no NULLs).
    """
    base = docs.select(F.col(id_col), _words(text_col).alias("w"))
    narrow = base.select(
        id_col,
        F.size("w").cast("long").alias("n_words"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct"),
        F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "transform(sequence(1, size(w) - 1),"
            " i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) "
            "ELSE CAST(array() AS array<string>) END"
        ).alias("bg"),
    ).select(
        id_col,
        "n_words",
        "n_distinct",
        F.size("bg").cast("long").alias("n_bigrams"),
        F.size(F.array_distinct("bg")).cast("long").alias("n_distinct_bigrams"),
    )
    tops = (
        base.select(id_col, F.explode("w").alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("top_cnt"))
    )
    nw = F.greatest(F.col("n_words"), F.lit(1)).cast("double")
    return narrow.join(tops, id_col, "left").select(
        id_col,
        "n_words",
        F.round(F.col("n_distinct") / nw, 6).alias("distinct_word_ratio"),
        F.round(F.coalesce(F.col("top_cnt"), F.lit(0)) / nw, 6).alias("top_word_ratio"),
        F.when(F.col("n_bigrams") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(1.0) - F.col("n_distinct_bigrams") / F.col("n_bigrams").cast("double"),
                6,
            )
        )
        .alias("dup_bigram_ratio"),
    )


def word_ngrams(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct word ``n``-grams per document as ``(id_col, gram)``.

    Narrow map (split + transform/slice + explode) — the distinct is
    per-document via ``array_distinct`` BEFORE the explode, so no
    shuffle happens here at all.
    """
    return (
        docs.select(F.col(id_col), _words(text_col).alias("w"))
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"CASE WHEN size(w) >= {n} THEN array_distinct("
                    f"transform(sequence(1, size(w) - {n} + 1),"
                    f" i -> array_join(slice(w, i, {n}), ' '))) "
                    "ELSE CAST(array() AS array<string>) END"
                )
            ).alias("gram"),
        )
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with a benchmark/eval set (the Lee et al. /
    GPT-3-appendix overlap rule that every serious pre-training
    pipeline runs before training).

    Returns one row per ``train`` document: ``n_hits`` = number of the
    document's DISTINCT n-grams that occur anywhere in the benchmark,
    and ``contaminated`` = ``n_hits > 0``.

    Scale: benchmark suites are tiny next to a 100 TB corpus, so the
    benchmark gram set is broadcast — the training side is a pure scan
    + narrow n-gram explode into a BroadcastHashJoin (no corpus
    shuffle).  Grams join on ``md5(gram)`` so the broadcast ships
    fixed-width hashes, not strings.  The per-doc hit count shuffles
    only the matched rows (rare by construction), and the final
    join-back of hits to the corpus broadcasts the hit table for the
    same reason.  Nothing in this plan moves the corpus.
    """
    bench_grams = (
        word_ngrams(benchmark, n, text_col, id_col)
        .select(F.md5("gram").alias("gram_h"))
        .distinct()
    )
    hits = (
        word_ngrams(train, n, text_col, id_col)
        .select(id_col, F.md5("gram").alias("gram_h"))
        .join(F.broadcast(bench_grams), "gram_h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return train.select(id_col).join(F.broadcast(hits), id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.coalesce(F.col("n_hits") > 0, F.lit(False)).alias("contaminated"),
    )


def cap_per_source(
    docs: DataFrame,
    cap: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    prefilter_margin: int = 8,
) -> DataFrame:
    """Per-source frequency capping: keep at most ``cap`` documents per
    source, chosen deterministically by md5-hash order (the per-domain
    cap every web-crawl pipeline applies so one boilerplate-heavy host
    cannot dominate the training mixture).

    Scale shape — the naive plan is a ``row_number`` window partitioned
    by source, which hot-keys one reducer with the ENTIRE largest
    source (at crawl scale: billions of rows for a single domain).
    Instead, two phases:

    1. per-source counts (a tiny aggregate) derive an md5-cutoff
       prefilter that passes ~``cap * prefilter_margin`` rows per
       source — pure integer arithmetic (``(cap * margin * 2^32) div
       count``), so the SQL oracle reproduces the cutoff bit-exactly;
    2. the exact ``row_number`` cap runs on the prefiltered rows, so
       the worst window partition holds O(cap * margin) rows, not
       O(largest source).

    The prefilter is deterministic, so reruns and the oracle agree by
    construction.  With an 8x margin the chance that a source passes
    fewer than ``cap`` rows through the cutoff while having more than
    ``cap`` total is Chernoff-negligible, and if it ever happened both
    the engine and the oracle would keep the same (slightly smaller)
    set.  Sources at or below ``cap * margin`` skip the prefilter
    entirely (cutoff saturates above every md5 digest).
    """
    from pyspark.sql import Window

    counts = docs.groupBy(source_col).agg(F.count("*").alias("_n"))
    # integer cutoff: min(2^32, cap*margin*2^32 div n) rendered as an
    # 8-hex-digit string; the saturated case renders as 'g', which
    # sorts above every hex digest (same trick as sampling._cutoff_hex)
    budget = int(cap) * int(prefilter_margin)
    cutoff = F.when(F.col("_n") <= F.lit(budget), F.lit("g")).otherwise(
        F.lpad(
            F.lower(F.conv(F.expr(f"{budget * (1 << 32)}L div _n"), 10, 16)),
            8,
            "0",
        )
    )
    pre = docs.join(
        F.broadcast(counts.select(source_col, cutoff.alias("_cut"))), source_col
    ).where(sample_hash(key_col) < F.col("_cut"))
    w = Window.partitionBy(source_col).orderBy(sample_hash(key_col), key_col)
    return (
        pre.withColumn("rank_in_source", F.row_number().over(w))
        .where(F.col("rank_in_source") <= cap)
        .drop("_cut")
    )


def line_dedup(
    docs: DataFrame,
    min_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str | None = None,
) -> DataFrame:
    """Line-level boilerplate removal (the RefinedWeb/CCNet rule): a
    trimmed non-empty line occurring in at least ``min_docs`` DISTINCT
    documents (within one ``source_col`` scope, or corpus-wide when
    None) is boilerplate — navigation chrome, cookie banners, repeated
    headers — and every occurrence is dropped; all other lines keep
    their original text and order.

    Returns one row per input document: ``n_lines`` / ``n_removed``
    counts plus the length and md5 of the cleaned text, so an oracle
    can verify the full reassembled string without hauling it around.

    Scale shape: one narrow line explode, then the boilerplate
    dictionary is a (scope, line-hash) count-distinct aggregate —
    map-side combine collapses the per-doc repeats before the
    exchange, and the surviving dictionary holds only lines that
    clear ``min_docs``, tiny next to the corpus.  Removal is a LEFT
    ANTI equi-join keyed by the same (scope, hash) tuple (never a
    broadcast of raw strings — md5 keys are fixed-width), and
    reassembly re-aggregates by ``id_col`` only.  Nothing in the plan
    sorts or shuffles whole documents except the per-doc regroup,
    which is keyed by the id the scan is already clustered by.
    """
    scope = [source_col] if source_col else []
    lines = docs.select(
        F.col(id_col),
        *scope,
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("idx", "line"),
    ).withColumn("line_h", F.md5(F.trim(F.col("line"))))
    boiler = (
        lines.where(F.length(F.trim(F.col("line"))) > 0)
        .groupBy(*scope, "line_h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .where(F.col("nd") >= int(min_docs))
        .select(*scope, "line_h")
    )
    kept = lines.join(boiler, [*scope, "line_h"], "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "line"))),
                lambda x: x["line"],
            ),
        ).alias("clean_text"),
    )
    base = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n", -1)).cast("long").alias("n_lines"),
    )
    clean_text = F.coalesce(F.col("clean_text"), F.lit(""))
    return base.join(clean, id_col, "left").select(
        id_col,
        "n_lines",
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.length(clean_text).cast("long").alias("clean_len"),
        F.md5(clean_text).alias("clean_md5"),
    )


def split_corpus(
    docs: DataFrame,
    eval_fraction: float,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, benchmark) split by md5-hash cutoff on the
    id — retry/rerun/partitioning-stable, and exactly reproducible in
    the SQL oracle (see operators.sampling for why md5)."""
    from turtle_spark.operators.sampling import _cutoff_hex

    cutoff = F.lit(_cutoff_hex(eval_fraction))
    h = sample_hash(id_col)
    return docs.where(~(h < cutoff)), docs.where(h < cutoff)


def normalize_text(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode normalization + junk-codepoint cleanup — the first
    transform of every web-crawl curation pipeline (ftfy-lite):

    1. NFC normalization (combining sequences -> precomposed forms,
       so 'e' + U+0301 and U+00E9 dedup/shingle identically);
    2. strip zero-width & bidi-control codepoints (U+200B..U+200F,
       U+202A..U+202E, U+2060, U+FEFF) — invisible characters that
       break exact dedup and token counts;
    3. strip C0/C1 controls except \\t and \\n; CRLF/CR -> LF;
    4. collapse runs of spaces/tabs to one space, trim line edges.

    Runs as ONE vectorized Arrow pass (pandas ``str`` ops are the
    right seam here: Spark has no NFC builtin, and a JVM regex can't
    do normalization) — no shuffle, no per-row Python.  Returns
    (id, text, norm_text, n_raw_chars, n_norm_chars, changed).

    Spark-side alternatives were measured and rejected: a translate()
    chain can delete codepoints but cannot compose NFC.
    """
    import re

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    zw = re.compile("[\u200b-\u200f\u202a-\u202e\u2060\ufeff]")
    ctrl = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
    ws = re.compile("[ \t]+")
    edge = re.compile(" ?\n ?")

    @pandas_udf(T.StringType())
    def norm_udf(texts: pd.Series) -> pd.Series:
        s = texts.str.normalize("NFC")
        s = s.str.replace("\r\n", "\n", regex=False).str.replace(
            "\r", "\n", regex=False
        )
        s = s.str.replace(zw, "", regex=True)
        s = s.str.replace(ctrl, "", regex=True)
        s = s.str.replace(ws, " ", regex=True)
        s = s.str.replace(edge, "\n", regex=True)
        return s.str.strip()

    return docs.select(
        F.col(id_col),
        F.col(text_col).alias("text"),
        norm_udf(F.col(text_col)).alias("norm_text"),
    ).select(
        id_col,
        "text",
        "norm_text",
        F.length("text").cast("long").alias("n_raw_chars"),
        F.length("norm_text").cast("long").alias("n_norm_chars"),
        (F.col("text") != F.col("norm_text")).alias("changed"),
    )


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """DEFLATE compression ratio per document — the classic cheap
    redundancy signal (used alongside Gopher rules in web-crawl
    curation): templated/boilerplate text compresses far below prose,
    random noise barely compresses at all, so both filter tails hang
    off this one number.

    One Arrow-batched pass, zero shuffles; zlib at a FIXED level so
    the byte count — and therefore the ratio — is deterministic (the
    golden mirror runs the same zlib on the same bytes).  The ratio's
    operands are exact ints; the single division is bit-stable.

    Returns (id_col, n_bytes, n_compressed, compression_ratio) —
    ratio = compressed/raw, 0.0 for empty docs.
    """
    import zlib

    out_schema = T.StructType(
        [
            next(f for f in docs.schema.fields if f.name == id_col),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("n_compressed", T.LongType()),
        ]
    )

    def batches(it):
        for pdf in it:
            raw = [t.encode("utf-8") if t else b"" for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [len(b) for b in raw],
                    "n_compressed": [
                        len(zlib.compress(b, level)) if b else 0 for b in raw
                    ],
                }
            )

    return (
        docs.select(id_col, text_col)
        .mapInPandas(batches, schema=out_schema)
        .select(
            id_col,
            "n_bytes",
            "n_compressed",
            F.when(F.col("n_bytes") == 0, F.lit(0.0))
            .otherwise(
                F.col("n_compressed").cast("double") / F.col("n_bytes")
            )
            .alias("compression_ratio"),
        )
    )
