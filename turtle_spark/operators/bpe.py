"""Distributed BPE vocabulary induction (Sennrich et al. 2016,
arXiv:1508.07909) — learn a byte-pair-encoding merge table from a
document corpus with DataFrame aggregations only.

The classic trainer runs on the *distinct-word frequency table*, not
the raw corpus: tokenizing 100 TB of text yields a words table whose
size is the corpus VOCABULARY (millions of rows, not trillions), and
every merge iteration is one weighted pair-count aggregation over it.
That is the whole scale story:

* one corpus pass builds ``(word_tokens, freq)`` — a map-side-combined
  groupBy on the word string;
* each of the ``n_merges`` iterations is (a) one hash aggregation of
  adjacent-pair counts (in-array ``transform``, no self-join), (b) a
  1-row ``collect`` of the argmax pair (driver-sized by definition —
  the same bounded-collect contract as the mixture spec), (c) one
  narrow left-greedy fold that rewrites token arrays (pure Column
  expression, no shuffle);
* the argmax tie-break is total — count desc, then (left, right)
  lexicographic asc — so the learned merge table is bit-identical at
  any parallelism;
* lineage is truncated with ``localCheckpoint`` every few merges, the
  same bounded-plan-depth discipline as the PageRank loop
  (``operators/graph.py``).

Words are ASCII-whitespace tokens (Java and Python ``\\s`` disagree on
unicode — same restriction as ``textstats``), characters are the
initial symbols, and the end-of-word marker ``</w>`` is appended as
its own symbol so merges can learn word-final units.  ``max_word_len``
bounds a pathological unbroken-text "word" (the skew guard — a 1 MB
word would otherwise explode to a 1M-element array on one row).

The reference repo has no tokenizer-training surface (it is a Turtle
parser); this operator belongs to the training-data pipeline family
the brief adds (SURVEY.md §2.2).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = ["bpe_encode", "bpe_word_counts", "train_bpe"]

_WS = "[ \\t\\n\\r]+"  # ASCII whitespace — identical in Java and Python
_EOW = "</w>"


def bpe_word_counts(
    docs: DataFrame, text_col: str = "text", max_word_len: int = 64
) -> DataFrame:
    """(word, freq) -> (toks: array<string>, freq: bigint).

    One explode + one map-side-combined count; token arrays are the
    word's characters plus the ``</w>`` marker.  Words longer than
    ``max_word_len`` characters are dropped (skew bound, documented
    above); empty strings from leading separators are filtered.
    """
    words = (
        docs.select(
            F.explode(F.split(F.col(text_col), _WS)).alias("word")
        )
        .where((F.length("word") > 0) & (F.length("word") <= max_word_len))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    return words.select(
        F.concat(
            F.split(F.col("word"), ""),  # one element per character
            F.array(F.lit(_EOW)),
        ).alias("toks"),
        "freq",
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_expr(left: str, right: str) -> F.Column:
    """Left-greedy non-overlapping rewrite of adjacent (left, right)
    token pairs into one merged token — a pure fold, no Python."""
    a, b, m = _sql_quote(left), _sql_quote(right), _sql_quote(left + right)
    return F.expr(
        f"""
        aggregate(toks, cast(array() as array<string>), (acc, t) ->
          CASE WHEN size(acc) > 0
                    AND element_at(acc, -1) = {a} AND t = {b}
               THEN concat(slice(acc, 1, size(acc) - 1), array({m}))
               ELSE concat(acc, array(t)) END)
        """
    )


def _train_local(
    words: list[tuple[list[str], int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Driver tail of the trainer: the same argmax/tie-break/greedy-
    rewrite loop over an in-memory word list.  Semantically identical
    to the distributed loop (differential-tested); used when the
    vocabulary fits ``local_cutoff`` — per-iteration job-scheduling
    cost would otherwise dwarf the work, exactly the cc.py
    ``local_cutoff`` reasoning."""
    from collections import Counter

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for toks, freq in words:
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += freq
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, int(n)))
        new_words = []
        for toks, freq in words:
            out: list[str] = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            new_words.append((out, freq))
        words = new_words
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int = 30,
    text_col: str = "text",
    max_word_len: int = 64,
    checkpoint_every: int = 6,
    local_cutoff: int = 20_000,
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns the ordered merge table
    as ``[(rank, left, right, merged, pair_freq), ...]``.

    Stops early when no adjacent pair remains.  The merge table is
    the driver-sized training artifact (a tokenizer config — one row
    per merge by definition); the heavy lifting stays distributed.

    The distributed loop runs when the distinct-word table exceeds
    ``local_cutoff`` rows (web-scale vocabularies are millions); under
    the cutoff the word-frequency table — already the aggregated,
    corpus-size-independent trainer state — is collected once and the
    merge loop runs driver-side (``_train_local``, bit-identical
    semantics, no per-iteration job scheduling).
    """
    words = bpe_word_counts(docs, text_col, max_word_len).persist()
    n_words = words.count()  # materialize before the loop
    if n_words <= local_cutoff:
        rows = words.collect()
        words.unpersist()
        return _train_local(
            [(list(r["toks"]), int(r["freq"])) for r in rows], n_merges
        )
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            pairs = (
                words.where(F.size("toks") >= 2)
                .select(
                    F.explode(
                        F.expr(
                            """
                            transform(slice(toks, 1, size(toks) - 1),
                              (t, i) -> struct(t AS a, toks[i + 1] AS b))
                            """
                        )
                    ).alias("p"),
                    "freq",
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("n"))
            )
            top = pairs.orderBy(
                F.col("n").desc(), F.col("a").asc(), F.col("b").asc()
            ).limit(1).collect()
            if not top:
                break
            a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
            merges.append((rank, a, b, a + b, n))
            new_words = words.withColumn("toks", _merge_expr(a, b))
            if rank % checkpoint_every == 0:
                new_words = new_words.localCheckpoint()
            else:
                new_words = new_words.persist()
                new_words.count()
            words.unpersist()
            words = new_words
    finally:
        words.unpersist()
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    max_word_len: int = 64,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table: adds ``out_col`` (array<string> of
    BPE tokens) to every document.

    Merges apply in rank order with the same left-greedy rewrite the
    trainer used, so encoding a training document reproduces its
    final trainer state.  The merge table rides along in the UDF
    closure (one broadcast per executor — a tokenizer config is KB-
    sized by definition); the kernel is an Arrow-batched pandas UDF
    with a per-batch word cache, the engine's standard custom-kernel
    path (same shape as the sketch UDFs in functions/hashing.py).
    Words above ``max_word_len`` chars pass through as single opaque
    tokens (mirror of the trainer's skew guard — they were never
    merge candidates, and splitting them to characters would bloat
    the output by the same skew the trainer refused).
    """
    ordered = [(m[1], m[2], m[3]) for m in sorted(merges)]

    @pandas_udf(T.ArrayType(T.StringType()))
    def encode_udf(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def encode_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            if len(w) > max_word_len:
                toks = [w]
            else:
                toks = list(w) + [_EOW]
                for a, b, m in ordered:
                    if a not in toks:
                        continue
                    out: list[str] = []
                    for t in toks:
                        if out and out[-1] == a and t == b:
                            out[-1] = m
                        else:
                            out.append(t)
                    toks = out
            cache[w] = toks
            return toks

        def encode_text(text: str) -> list[str]:
            out: list[str] = []
            for w in re.split("[ \\t\\n\\r]+", text or ""):
                if w:
                    out.extend(encode_word(w))
            return out

        return texts.map(encode_text)

    return docs.withColumn(out_col, encode_udf(F.col(text_col)))
