"""Distributed Bloom filter: mergeable build, broadcast probe.

The semi-join pruning primitive the screening operators want at
100 TB: membership of a big table's keys in a (relatively) small key
set, WITHOUT shuffling the big table.  The filter is built with one
partial-aggregating ``bit_or`` shuffle over the KEY SIDE only (at
most ``n_bits/64`` word rows per upstream partition move), collected
to ~n_bits/8 bytes, and probed by a closure-broadcast vectorized
Arrow UDF — the corpus side stays narrow: no join, no exchange, no
per-row Python.

Spark 3.3+'s runtime row-group bloom filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does a version
of this inside joins automatically; this operator makes the filter a
first-class, REUSABLE artifact (build once per benchmark/blocklist
snapshot, probe many corpora) with deterministic xxhash64 positions —
so the golden oracle can re-derive every bit, and a probe's pass set
is bit-identical at any parallelism.

Determinism contract: positions are ``xxhash64("<i>|" + key)`` mod
n_bits (seed 42, same scheme as Count-Min's salted cells), replicated
exactly by ``tools/golden_ref``.  False positives are thus not random
— they are a fixed function of the key sets — which is what makes the
operator testable: the fp count in the report query is a pinned
number, not a distribution.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

BLOOM_BITS = 1 << 20
BLOOM_HASHES = 4


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(F.concat(F.lit(f"{i}|"), key.cast("string"))), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """(word, bits) rows — the OR-aggregated 64-bit words of the
    filter.  Associatively mergeable (bit_or), partial-aggregates
    map-side, and the shuffle moves at most n_bits/64 rows per
    upstream partition regardless of key count."""
    pos = F.explode(F.array(*_positions(F.col(key_col), n_bits, n_hashes))).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.shiftrightunsigned(F.col("pos"), 6).alias("word"),
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_bits_array(bloom: DataFrame, n_bits: int = BLOOM_BITS) -> np.ndarray:
    """Collect the word table into a dense uint64 array (n_bits/8
    bytes — 128 KB at the default size): the broadcastable artifact."""
    arr = np.zeros(n_bits // 64, dtype=np.uint64)
    for r in bloom.collect():
        arr[r["word"]] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    return arr


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bits: np.ndarray,
    n_hashes: int = BLOOM_HASHES,
    out_col: str = "bloom_pass",
) -> DataFrame:
    """Add ``out_col``: True iff every hash position's bit is set
    (maybe-member); False is a definite non-member.  The bits array
    rides the UDF closure (one copy per executor); the probe is one
    vectorized Arrow pass — zero joins, zero shuffle."""
    n_bits = bits.size * 64

    @pandas_udf(T.BooleanType())
    def probe_udf(*hash_cols: pd.Series) -> pd.Series:
        ok = np.ones(len(hash_cols[0]), dtype=bool)
        for h in hash_cols:
            pos = h.to_numpy(dtype=np.int64)
            word = bits[pos >> 6]
            mask = np.uint64(1) << (pos & 63).astype(np.uint64)
            ok &= (word & mask) != 0
        return pd.Series(ok)

    return df.withColumn(
        out_col, probe_udf(*_positions(F.col(key_col), n_bits, n_hashes))
    )


def bloom_prune_report(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Grading report for the bloom-pruned semi-join: ONE row with
    n_total (big-side rows), n_bloom_pass (rows surviving the
    broadcast bloom probe — the only rows the exact join would ever
    see), n_true (exact semi-join matches), n_false_pos (pruning
    overhead; definite non-members never pass, so
    n_bloom_pass - n_true), fp_rate.

    The deliberately small default ``n_bits`` (2^16) makes false
    positives actually occur at test scale so the report pins them.
    """
    from turtle_spark.operators.skew import pin

    keys = pin(small.select(F.col(small_key).alias("_k")).distinct())
    bits = bloom_bits_array(bloom_build(keys, "_k", n_bits, n_hashes), n_bits)
    probed = pin(
        bloom_probe(big.select(F.col(big_key).alias("_bk")), "_bk", bits, n_hashes)
    )
    passed = probed.where(F.col("bloom_pass"))
    true_m = passed.join(
        F.broadcast(keys), passed["_bk"] == keys["_k"], "left_semi"
    )
    return (
        probed.agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("n_bloom_pass"),
        )
        .crossJoin(true_m.agg(F.count(F.lit(1)).alias("n_true")))
        .select(
            "n_total",
            "n_bloom_pass",
            "n_true",
            (F.col("n_bloom_pass") - F.col("n_true")).alias("n_false_pos"),
            F.round(
                (F.col("n_bloom_pass") - F.col("n_true")).cast("double")
                / F.greatest(F.col("n_total") - F.col("n_true"), F.lit(1)).cast("double"),
                6,
            ).alias("fp_rate"),
        )
    )
