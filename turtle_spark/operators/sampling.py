"""Deterministic sampling for training-data pipelines.

At 100 TB you cannot sample with RNG state: a task retry would redraw
and silently duplicate/lose rows (the SPARK-23207 class of bug), and a
re-run of the pipeline would produce a different training set.  The
scale-correct primitive is a *content-keyed hash cutoff*: a row is in
the sample iff ``h(key) < fraction`` for a uniform hash ``h`` — stable
across retries, executors, partitionings, and engine versions.

The hash here is the first 8 hex chars of ``md5(key)`` compared
lexicographically against a hex cutoff.  md5 is overkill
cryptographically but is the one hash Spark and DuckDB compute
BIT-IDENTICALLY (lowercase hex in both), which makes every sample
oracle-checkable — xxhash64 exists only on the Spark side.

All pure column expressions: whole-stage codegen, no shuffle — a
sample is a FILTER, and it composes with pushdown (the md5 filter sits
on top of the scan, everything below it prunes normally).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from turtle_spark.functions.mixture import mixture_fractions

__all__ = [
    "deterministic_sample",
    "leakage_safe_split",
    "mixture_fractions",
    "mixture_sample",
    "sample_hash",
    "sample_sql_predicate",
    "split_assign",
    "stratified_sample",
]

_HEX_DIGITS = 8  # 32 bits of the digest: granularity 1/2^32


def _cutoff_hex(fraction: float) -> str:
    """fraction in [0,1] -> 8-hex-digit lexicographic cutoff."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = int(round(fraction * (1 << 32)))
    if n >= 1 << 32:
        return "g"  # lexicographically above every 8-hex-digit digest
    return format(n, "08x")


def sample_hash(*key_cols: str | Column) -> Column:
    """The sampling key: first 8 hex chars of md5 over the
    ``||``-joined key columns (cast to string, null -> '')."""
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"), F.lit(""))
        for c in key_cols
    ]
    return F.substring(F.md5(F.concat_ws("|", *parts)), 1, _HEX_DIGITS)


def deterministic_sample(
    df: DataFrame, key_cols: list[str], fraction: float
) -> DataFrame:
    """Keep rows whose hash falls under the cutoff — a pure filter.

    The same (key, fraction) always makes the same keep/drop decision,
    and samples NEST: the 1% sample is a subset of the 10% sample, so
    growing a training set keeps everything already curated."""
    return df.where(sample_hash(*key_cols) < F.lit(_cutoff_hex(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_cols: list[str],
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling with per-value fractions.

    One CASE expression over the strata column picks the cutoff; no
    shuffle, no per-stratum pass — at any scale this is a single
    filtered scan.  Strata absent from ``fractions`` use
    ``default_fraction``."""
    cutoff = F.lit(_cutoff_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_cutoff_hex(frac))
        ).otherwise(cutoff)
    return df.where(sample_hash(*key_cols) < cutoff)


def mixture_sample(
    df: DataFrame,
    bucket_col: str,
    key_cols: list[str],
    weights: dict[str, float],
    budget: int,
) -> DataFrame:
    """Deterministic corpus composition to target mixture ``weights``.

    One bounded groupBy-count (|buckets| rows to the driver — the
    mixture spec is driver-sized by definition), water-fill to
    per-bucket fractions, then ONE stratified hash-cutoff filter over
    the corpus: no shuffle touches the data rows at any scale, and the
    sample nests/repeats exactly like ``deterministic_sample``.

    The realized size approximates ``budget``: the md5 cutoff keeps
    ``~fraction * count`` rows per bucket (binomial jitter around the
    target, exact determinism per row).  Buckets absent from
    ``weights`` are dropped.
    """
    counts = {
        r[0]: r[1]
        for r in df.where(F.col(bucket_col).isin(list(weights)))
        .groupBy(bucket_col)
        .count()
        .collect()
    }
    fracs = mixture_fractions(counts, weights, budget)
    return stratified_sample(df, bucket_col, key_cols, fracs, default_fraction=0.0)


def split_assign(
    df: DataFrame,
    group_col: str | Column,
    splits: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a dataset split (train/val/test/...) keyed by
    ``group_col`` — rows sharing a group value ALWAYS land in the same
    split.

    The split is a pure function of ``md5(salt|group)`` against
    cumulative hex cutoffs (insertion order of ``splits``; fractions
    must sum to 1 within cutoff granularity — the last split absorbs
    the rounding tail).  Like every sampler in this module it is one
    CASE expression: no shuffle, no RNG, stable under retries, and the
    same (salt, group) maps to the same split on every engine version
    and at any data scale — growing the corpus never reshuffles
    existing groups between splits.
    """
    names = list(splits)
    if len(names) < 2:
        raise ValueError("need at least two splits")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    gcol = F.col(group_col) if isinstance(group_col, str) else group_col
    h = F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), gcol.cast("string"))),
        1,
        _HEX_DIGITS,
    )
    cum = 0.0
    expr = None  # first matching cutoff wins; last split is the tail
    for name in names[:-1]:
        cum += splits[name]
        cond = h < F.lit(_cutoff_hex(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def leakage_safe_split(
    docs: DataFrame,
    cluster_map: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Dataset split that near-duplicates can never straddle.

    ``cluster_map`` is (id_col, canonical_id) from any dedup tier
    (exact / MinHash / SimHash / embedding / SemDeDup components);
    each document's split is keyed by ``group_key =
    coalesce(canonical_id, id)`` so an entire near-dup cluster moves
    as one unit — the train/test contamination a per-document split
    creates (the same web page crawled twice landing on both sides of
    the boundary) is impossible by construction.

    The join is an equi left join on the id (broadcastable when the
    dedup tier found few clusters — the common case); everything else
    is the shuffle-free ``split_assign`` filter.  Adding documents to
    the corpus never moves an existing group between splits.
    """
    cmap = cluster_map.select(
        F.col(id_col).alias("_cm_id"), F.col("canonical_id").alias("_cm_canon")
    )
    joined = docs.join(cmap, on=docs[id_col] == cmap["_cm_id"], how="left")
    joined = joined.withColumn(
        "group_key", F.coalesce(F.col("_cm_canon"), F.col(id_col))
    ).drop("_cm_id", "_cm_canon")
    return split_assign(joined, "group_key", splits, salt=salt)


def sample_sql_predicate(key_cols: list[str], fraction: float) -> str:
    """The equivalent ANSI/DuckDB predicate, for oracle SQL."""
    joined = ", ".join(f"COALESCE(CAST({c} AS VARCHAR), '')" for c in key_cols)
    return (
        f"substr(md5(concat_ws('|', {joined})), 1, {_HEX_DIGITS})"
        f" < '{_cutoff_hex(fraction)}'"
    )


def length_matched_sample(
    docs: DataFrame,
    n_bins: int = 10,
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    sketch_k: int = 256,
) -> DataFrame:
    """Flatten the corpus' length distribution: bin documents by
    sketch-estimated length quantiles, then downsample every bin to
    the smallest bin's size — the curriculum/balance resampler that
    stops a length-skewed crawl from teaching the model only one
    document shape.  (Temperature-flattening over an arbitrary
    covariate is this same shape with a different per-bin target.)

    Composition of two existing scale primitives:

    1. bin BOUNDARIES come from the mergeable min-k quantile sketch
       (one bounded shuffle; never a global sort — ``ntile`` over the
       whole corpus would serialize the largest reducer);
    2. per-bin downsampling reuses ``cap_per_source``'s two-phase
       md5-cutoff + bounded ``row_number``, so the largest bin never
       hot-keys a reducer either.

    Returns the per-bin report (bin, n_before, n_after, kept_fp) —
    ``kept_fp`` is the XOR of xxhash64 over the KEPT ids, pinning the
    exact selection, not just its size.
    """
    from turtle_spark.operators.curation import cap_per_source
    from turtle_spark.operators.sketches import kmv_quantiles

    qs = tuple(i / n_bins for i in range(1, n_bins))
    row = kmv_quantiles(
        docs.select(F.lit("g").alias("_g"), id_col, value_col),
        ["_g"], value_col, id_col, qs=qs, k=sketch_k,
    ).collect()[0]
    bounds = [row[f"q_{str(q).replace('0.', 'p')}"] for q in qs]
    bin_expr = sum(
        (F.col(value_col) > F.lit(b)).cast("int") for b in bounds
    ).alias("_bin")
    binned = docs.select(F.col(id_col), F.col(value_col), bin_expr)
    counts = binned.groupBy("_bin").agg(F.count(F.lit(1)).alias("n_before"))
    target = min(r["n_before"] for r in counts.collect())
    kept = cap_per_source(binned, cap=target, source_col="_bin", key_col=id_col)
    report = kept.groupBy("_bin").agg(
        F.count(F.lit(1)).alias("n_after"),
        F.expr(f"bit_xor(xxhash64(cast({id_col} AS string)))").alias("kept_fp"),
    )
    return (
        counts.join(report, "_bin")
        .select(F.col("_bin").alias("bin"), "n_before", "n_after", "kept_fp")
        .orderBy("bin")
    )
