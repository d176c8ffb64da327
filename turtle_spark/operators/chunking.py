"""Document chunking for training-data pipelines.

Splits each document into fixed-size sliding windows of whitespace
tokens — the shape every LLM pre-training pipeline needs between
"clean corpus" and "tokenized batches".  Pure column expressions
(split / sequence / slice / array_join), so the whole transform stays
inside whole-stage codegen: no Python, no shuffle — chunking is a
narrow map over the documents scan and parallelizes embarrassingly at
any corpus size.

The reference (nvkp/turtle) has no counterpart; this belongs to the
training-data operator family the brief adds on top of the parser
(SURVEY.md §2.2 "Pipeline:" rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_text: bool = False,
) -> DataFrame:
    """Sliding-window token chunks per document.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``
    (whitespace tokenization); the last chunk may be short, and a
    document shorter than ``chunk_tokens`` yields exactly one chunk.
    Whitespace-only documents yield none.

    Output: ``(id_col, chunk_idx, n_tokens, chunk_hash)`` plus
    ``chunk_text`` when ``with_text`` — by default only the md5 of the
    chunk text travels, keeping the result narrow (at 100 TB the
    chunk-hash stream feeds chunk-level dedup without re-shipping the
    text).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    )
    # n_chunks = 1 + ceil((n - chunk)/stride) for n > chunk, else 1;
    # integer ceil via (x + stride - 1) div stride keeps it exact
    n_chunks = F.when(F.col("_n") <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1)
        + F.floor(
            (F.col("_n") - F.lit(chunk_tokens) + F.lit(stride) - F.lit(1))
            / F.lit(stride)
        ).cast("int")
    )
    start = F.col("chunk_idx") * stride  # 0-based token offset
    n_tokens = F.least(F.lit(chunk_tokens), F.col("_n") - start)
    chunk_text = F.array_join(
        F.slice(F.col("_toks"), start + 1, n_tokens), " "
    )
    out = base.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        "_toks",
        "_n",
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        n_tokens.cast("long").alias("n_tokens"),
        F.md5(chunk_text).alias("chunk_hash"),
        *([chunk_text.alias("chunk_text")] if with_text else []),
    )
    return out
