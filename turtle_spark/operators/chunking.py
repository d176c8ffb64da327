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
from pyspark.sql import types as T


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


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 512,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy next-fit sequence packing into fixed token budgets —
    the step between "chunked corpus" and "training batches" (packing
    short documents together is how LLM pre-training keeps padding
    waste low).

    Packing is inherently sequential (each decision depends on the
    running fill), so it cannot be a window expression; the scalable
    shape is BUCKETED sequential packing: every document lands in a
    deterministic hash bucket (``pmod(xxhash64(id), n_buckets)``), and
    packing runs next-fit in id order WITHIN each bucket via one
    ``applyInPandas``.  Buckets are independent, so the stage
    parallelizes to ``n_buckets`` tasks; at 100 TB you raise
    ``n_buckets`` so one bucket's documents fit an executor (the knob
    is data-dependent, NOT cluster-dependent — results are identical
    at any parallelism, which is what makes the output reproducible
    and oracle-checkable).  Cross-bucket packing waste is at most one
    partial pack per bucket — negligible for n_buckets << n_docs.

    Documents larger than ``max_tokens`` get a single-document
    oversize pack (pre-split them with ``chunk_documents`` if that is
    not wanted); whitespace-only documents are dropped (nothing to
    pack).  Token count = whitespace tokens, same tokenization as
    ``chunk_documents``.

    Output: ``(id_col, n_tokens, bucket, pack_id, pack_pos)`` with
    ``pack_id = bucket * 2^32 + per-bucket pack index`` (collision-free
    for < 2^32 packs per bucket).
    """
    import pandas as pd

    if max_tokens <= 0 or n_buckets <= 0:
        raise ValueError("max_tokens and n_buckets must be positive")
    c = F.col(text_col)
    base = docs.where(F.length(F.trim(c)) > 0).select(
        F.col(id_col),
        F.size(F.split(F.trim(c), r"\s+")).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )
    id_field = base.schema[id_col]

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        seqs, poss = [], []
        seq, pos, run = 0, 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > max_tokens:
                if pos > 0:
                    seq += 1
                seqs.append(seq)
                poss.append(0)
                seq, pos, run = seq + 1, 0, 0
                continue
            if run + n > max_tokens and pos > 0:
                seq, pos, run = seq + 1, 0, 0
            seqs.append(seq)
            poss.append(pos)
            run += n
            pos += 1
        pdf["pack_id"] = [(bucket << 32) + s for s in seqs]
        pdf["pack_pos"] = pd.Series(poss, dtype="int32")
        return pdf

    out_schema = T.StructType(
        [
            id_field,
            T.StructField("n_tokens", T.LongType()),
            T.StructField("bucket", T.IntegerType()),
            T.StructField("pack_id", T.LongType()),
            T.StructField("pack_pos", T.IntegerType()),
        ]
    )
    return base.groupBy("bucket").applyInPandas(_pack, schema=out_schema)
