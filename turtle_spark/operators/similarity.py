"""Similarity search over embedding columns (array<float>).

Two paths:

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small)
  query set against the corpus, dot products via ``F.zip_with`` +
  ``F.aggregate`` (JVM-side, no Python), window top-k per query.
  The correctness baseline and the right plan whenever |queries| is
  small — the corpus is scanned once, never shuffled.
* ``lsh_topk`` — random-hyperplane LSH: sign-bit signatures bucket the
  corpus; candidates are re-ranked exactly.  The scale path when the
  query set itself is huge (query-corpus join becomes bucket-local).
  Recall is tested against the brute-force baseline at small scale.

Embedding-cosine near-duplicate detection (``cosine_pairs``) is the
same dot-product machinery as a capped self-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_norm(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return embeddings.withColumn("_norm", _norm(F.col(vec_col)))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (broadcast query side).

    Output: (query_id, neighbor_id, cosine, rank); self-matches are
    excluded.
    """
    corpus = with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.col("_norm").alias("_cnorm"),
    )
    qs = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    scored = (
        corpus.join(F.broadcast(qs))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_cvec"), F.col("_qvec"))
                / (F.col("_cnorm") * F.col("_qnorm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_bits, dim)).astype(np.float32)


def lsh_signatures(
    embeddings: DataFrame,
    dim: int,
    n_bits: int = 16,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane sign signature as a single long bucket key."""
    # float64 projections: the sign decision must not depend on Arrow
    # batch shape (float32 GEMM blocking can flip near-zero signs), so
    # buckets are reproducible across partitionings and parallelism
    planes = _hyperplanes(dim, n_bits, seed).astype(np.float64)

    @pandas_udf(T.LongType())
    def sig_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ planes.T) > 0  # (n, n_bits)
        weights = (1 << np.arange(n_bits, dtype=np.int64))
        return pd.Series(bits @ weights)

    return embeddings.withColumn("bucket", sig_udf(F.col(vec_col)))


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: union of ``n_tables`` hyperplane bucketings,
    exact cosine re-rank of bucket-local candidates."""
    parts = []
    for t in range(n_tables):
        c = lsh_signatures(embeddings, dim, n_bits, seed=13 + t, id_col=id_col, vec_col=vec_col)
        q = lsh_signatures(queries, dim, n_bits, seed=13 + t, id_col=id_col, vec_col=vec_col)
        parts.append(
            c.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"), "bucket").join(
                q.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"), "bucket"),
                "bucket",
            ).drop("bucket")
        )
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)
    cands = cands.dropDuplicates(["query_id", "neighbor_id"]).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cands.withColumn(
        "cosine",
        F.round(
            _dot(F.col("_cvec"), F.col("_qvec"))
            / (_norm(F.col("_cvec")) * _norm(F.col("_qvec"))),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample_rows: int = 4096,
    iters: int = 8,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """K-means centroids from a bounded seeded sample (driver-side numpy).

    The sample is capped at ``sample_rows`` regardless of corpus size —
    at 100 TB this is still one small collect; Lloyd iterations run on
    a few-MB matrix.  Vectors are L2-normalized so Euclidean k-means
    clusters by cosine direction.

    The sample is DETERMINISTIC: rows are taken in xxhash64(id) order
    (a seeded pseudo-random but repartition-stable order), so the
    centroids — and hence ivf_topk results at partial probe — are
    stable across runs and partitionings.  A bare ``limit`` would
    sample whichever partitions respond first.
    """
    sample = np.stack(
        [
            np.asarray(r[0], dtype=np.float32)
            for r in embeddings.select(vec_col, F.col(id_col).alias("_id"))
            .orderBy(F.xxhash64(F.col("_id").cast("string")), F.col("_id"))
            .limit(sample_rows)
            .collect()
        ]
    )
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rs = np.random.RandomState(seed)
    centroids = sample[rs.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
    return centroids


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    n_probe: int = 1,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``cluster`` column: nearest ``n_probe`` centroid ids
    (exploded, so n_probe>1 duplicates rows — used on the query side).

    One vectorized matmul per Arrow batch; centroids ride along in the
    UDF closure (broadcast once per executor)."""
    # float64 assignment for batch-shape independence (same reasoning
    # as lsh_signatures); centroid TRAINING stays float32 — it runs
    # once, driver-side, on a fixed-order sample
    cents = centroids.astype(np.float64)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def assign_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cents.T  # (n, n_centroids)
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return embeddings.withColumn(
        "cluster", F.explode(assign_udf(F.col(vec_col)))
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus inverted into ``n_centroids``
    coarse cells, each query probes its ``n_probe`` nearest cells,
    exact cosine re-rank inside the probed cells.

    The scale path when both sides are large: the join is equi on
    ``cluster``, so each query touches n_probe/n_centroids of the
    corpus; recall tested against ``cosine_topk`` at small scale."""
    cents = train_ivf_centroids(embeddings, n_centroids, vec_col=vec_col, id_col=id_col)
    corpus = ivf_assign(embeddings, cents, n_probe=1, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"), "cluster"
    )
    qs = ivf_assign(queries, cents, n_probe=n_probe, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"), "cluster"
    )
    cands = (
        corpus.join(qs, "cluster")
        .drop("cluster")
        .dropDuplicates(["query_id", "neighbor_id"])
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    scored = cands.withColumn(
        "cosine",
        F.round(
            _dot(F.col("_cvec"), F.col("_qvec"))
            / (_norm(F.col("_cvec")) * _norm(F.col("_qvec"))),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_multi_buckets(
    embeddings: DataFrame,
    dim: int,
    n_bits: int,
    n_tables: int,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket) rows: ``n_tables`` hyperplane bucketings in
    ONE pass over the corpus (one stacked float64 matmul per Arrow
    batch), instead of ``n_tables`` separate scans."""
    planes = np.stack(
        [_hyperplanes(dim, n_bits, seed + t) for t in range(n_tables)]
    ).reshape(-1, dim).astype(np.float64)  # (T*b, dim)
    weights = 1 << np.arange(n_bits, dtype=np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def multi_sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ planes.T) > 0  # (n, T*b)
        bk = (bits.reshape(len(mat), n_tables, n_bits) * weights).sum(axis=2)
        return pd.Series(list(bk))

    return embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(multi_sig(F.col(vec_col))).alias("table", "bucket"),
    )


def cosine_pairs_lsh(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_bits: int = 8,
    n_tables: int = 16,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-gated exact cosine pairs — the SCALE path for pair mining.

    Plan shape: one narrow pass emits (id, table, bucket); candidates
    come from an EQUI self-join on (table, bucket) (never a
    BroadcastNestedLoopJoin); survivors are deduped to skinny (id1,
    id2) rows and only then joined back to their vectors for the exact
    cosine + threshold — vectors are never replicated through the
    bucket shuffle.

    Recall: a pair at cosine c collides per table with probability
    p(c)^n_bits where p(c) = 1 - arccos(c)/pi, so the miss probability
    is (1 - p^b)^T.  Size (n_bits, n_tables) for the THRESHOLD pair:
    near-dup mining at c>=0.9 works at the (8, 16) defaults (miss
    ~0.4%); a low threshold like 0.35 needs coarse buckets, e.g.
    (2, 32) for miss ~3e-7.  Exactness vs the brute-force join at
    those settings is pinned by pytest and the driver oracle.
    """
    buckets = lsh_multi_buckets(
        embeddings, dim, n_bits, n_tables, seed=seed, id_col=id_col, vec_col=vec_col
    )
    left = buckets.select("table", "bucket", F.col("id").alias("id1"))
    right = buckets.select("table", "bucket", F.col("id").alias("id2"))
    cands = (
        left.join(right, ["table", "bucket"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )
    e1 = with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("id1"), F.col(vec_col).alias("_v1"), F.col("_norm").alias("_n1")
    )
    e2 = with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("id2"), F.col(vec_col).alias("_v2"), F.col("_norm").alias("_n2")
    )
    return (
        cands.join(e1, "id1")
        .join(e2, "id2")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("_v1"), F.col("_v2")) / (F.col("_n1") * F.col("_n2")), 6),
        )
        .where(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, broadcast self-join).

    SMALL-SCALE ground truth only — this is an all-pairs non-equi join
    (BroadcastNestedLoopJoin).  The scale path is ``cosine_pairs_lsh``,
    which produces the same rows through an equi-join plan; this form
    stays as the oracle baseline it is validated against.
    """
    a = with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("id1"), F.col(vec_col).alias("_v1"), F.col("_norm").alias("_n1")
    )
    b = with_norm(embeddings, vec_col).select(
        F.col(id_col).alias("id2"), F.col(vec_col).alias("_v2"), F.col("_norm").alias("_n2")
    )
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("_v1"), F.col("_v2")) / (F.col("_n1") * F.col("_n2")), 6),
        )
        .where(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def hard_negatives(
    embeddings: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor, the ``k``
    most cosine-similar corpus vectors whose ``label_col`` DIFFERS
    from the anchor's — the negatives that sit closest to the decision
    boundary, which is what contrastive/metric-learning training (DPR,
    SimCSE-style) wants instead of random negatives.

    Scale shape is the IVF path's: corpus inverted once into coarse
    cells (n_probe=1), anchors probe their ``n_probe`` nearest cells,
    so each anchor scores n_probe/n_centroids of the corpus through an
    equi-join on ``cluster`` — never an all-pairs product.  Centroids
    come from the seeded fixed-order sample, so the mined pairs are
    bit-identical at any parallelism.

    Returns (anchor_id, neg_id, neg_label, cosine, rank), rank 1..k
    by cosine desc with neg_id as the deterministic tiebreak.
    """
    cents = train_ivf_centroids(embeddings, n_centroids, vec_col=vec_col, id_col=id_col)
    corpus = ivf_assign(embeddings, cents, n_probe=1, vec_col=vec_col).select(
        F.col(id_col).alias("neg_id"),
        F.col(label_col).alias("neg_label"),
        F.col(vec_col).alias("_cvec"),
        "cluster",
    )
    qs = ivf_assign(anchors, cents, n_probe=n_probe, vec_col=vec_col).select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("_albl"),
        F.col(vec_col).alias("_qvec"),
        "cluster",
    )
    cands = (
        corpus.join(qs, "cluster")
        .drop("cluster")
        .dropDuplicates(["anchor_id", "neg_id"])
        .where(F.col("neg_id") != F.col("anchor_id"))
        .where(F.col("neg_label") != F.col("_albl"))
    )
    scored = cands.withColumn(
        "cosine",
        F.round(
            _dot(F.col("_cvec"), F.col("_qvec"))
            / (_norm(F.col("_cvec")) * _norm(F.col("_qvec"))),
            6,
        ),
    )
    w = Window.partitionBy("anchor_id").orderBy(F.col("cosine").desc(), F.col("neg_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("anchor_id", "neg_id", "neg_label", "cosine", "rank")
    )


def cluster_label_purity(
    embeddings: DataFrame,
    n_centroids: int = 10,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """K-means topic clustering + label-purity report.

    Clusters the corpus by cosine direction (the same seeded
    ``train_ivf_centroids`` Lloyd loop the IVF index uses, so the
    centroids are deterministic at any parallelism) and scores each
    cluster against a ground-truth ``label_col``: cluster size, its
    majority label, and purity = majority count / size.  The standard
    external cluster-quality evaluation for topic discovery over
    training corpora.

    Scale shape: centroid training is one bounded driver-side sample
    (capped rows regardless of corpus size); assignment is one
    vectorized matmul per Arrow batch with the centroid matrix riding
    the UDF closure; the report aggregates over at most
    ``n_centroids x |labels|`` groups — a two-stage partial agg with
    no data-row shuffle beyond the (cluster, label) counts.

    Ties on the majority label break to the SMALLEST label so the
    report is deterministic; ordering is by cluster id.
    """
    cents = train_ivf_centroids(
        embeddings, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col
    )
    assigned = ivf_assign(embeddings, cents, n_probe=1, vec_col=vec_col)
    by = assigned.groupBy("cluster", F.col(label_col).alias("top_label")).agg(
        F.count(F.lit(1)).alias("top_n")
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("top_n").desc(), F.col("top_label").asc()
    )
    sizes = by.groupBy("cluster").agg(F.sum("top_n").alias("size"))
    return (
        by.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
        .join(sizes, "cluster")
        .select(
            "cluster",
            "size",
            "top_label",
            "top_n",
            F.round(F.col("top_n") / F.col("size"), 6).alias("purity"),
        )
        .orderBy("cluster")
    )


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    sample_rows: int = 4096,
    iters: int = 8,
    seed: int = 29,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search"): the vector splits into
    ``m`` subspaces, each with its own ``n_codes``-entry L2 k-means
    codebook, so a d-float vector compresses to m small codes — at
    100 TB the corpus side of an ANN scan shrinks from d*4 bytes to m
    bytes per row, which is the difference between scanning embeddings
    and scanning a codes column.

    Training mirrors ``train_ivf_centroids``' determinism contract:
    bounded sample in (xxhash64(id), id) order, seeded init per
    subspace, Lloyd on a few-MB driver matrix.  Vectors are
    L2-normalized BEFORE splitting so the asymmetric-distance inner
    product approximates cosine.

    Returns ``(m, n_codes, d // m)`` float32; d must divide by m.
    """
    sample = np.stack(
        [
            np.asarray(r[0], dtype=np.float32)
            for r in embeddings.select(vec_col, F.col(id_col).alias("_id"))
            .orderBy(F.xxhash64(F.col("_id").cast("string")), F.col("_id"))
            .limit(sample_rows)
            .collect()
        ]
    )
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    books = np.empty((m, n_codes, dsub), dtype=np.float32)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        rs = np.random.RandomState(seed + j)
        cb = sub[rs.choice(len(sub), size=min(n_codes, len(sub)), replace=False)].copy()
        for _ in range(iters):
            # argmin ||x - c||^2 = argmin (||c||^2 - 2 x.c); argmin's
            # first-match tie rule keeps assignment deterministic
            d2 = (cb**2).sum(axis=1)[None, :] - 2.0 * (sub @ cb.T)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cb)):
                members = sub[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[j] = cb
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``codes`` column: per-subspace nearest-codebook-entry ids
    (array<int>, length m).  One vectorized float64 pass per Arrow
    batch; codebooks ride in the UDF closure (broadcast once per
    executor).  float64 so assignment is batch-shape independent."""
    books = codebooks.astype(np.float64)
    m, n_codes, dsub = books.shape

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def encode_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        out = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            d2 = (books[j] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ books[j].T)
            out[:, j] = np.argmin(d2, axis=1).astype(np.int32)
        return pd.Series(list(out))

    return embeddings.withColumn("codes", encode_udf(F.col(vec_col)))


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate top-k via asymmetric distance computation (ADC):
    the corpus is scanned as m-byte codes, each query precomputes a
    (m x n_codes) lookup table of subspace inner products, and a
    candidate's score is m JVM-side table lookups — ZERO Python in the
    per-candidate hot path, and the corpus side never touches the
    original vectors after encoding.

    Scale shape: queries (small side) broadcast with their flattened
    LUTs; score = ``aggregate(sequence(...))`` over the codes array —
    whole-stage-codegen'd, memory traffic m bytes/row vs d*4 for brute
    force.  Compose with an IVF cell equi-join for a two-level
    IVFADC index when the query side is also large.

    Scores round to 6 dp like the other similarity operators; rank
    ties break on neighbor_id.  Returns (query_id, neighbor_id,
    score, rank).
    """
    books = train_pq_codebooks(
        embeddings, m=m, n_codes=n_codes, vec_col=vec_col, id_col=id_col
    )
    b64 = books.astype(np.float64)
    dsub = b64.shape[2]

    corpus = pq_encode(embeddings, books, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def lut_udf(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            q = np.asarray(v, dtype=np.float64)
            q = q / max(float(np.linalg.norm(q)), 1e-12)
            # matvec per subspace — the golden mirror uses the identical
            # shape/order so BLAS summation order matches
            lut = np.concatenate(
                [b64[j] @ q[j * dsub : (j + 1) * dsub] for j in range(b64.shape[0])]
            )
            out.append(lut)
        return pd.Series(out)

    qs = queries.select(
        F.col(id_col).alias("query_id"), lut_udf(F.col(vec_col)).alias("lut")
    )
    scored = (
        corpus.join(F.broadcast(qs))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(
                F.expr(
                    f"aggregate(sequence(0, {m - 1}), CAST(0.0 AS DOUBLE), "
                    f"(acc, j) -> acc + element_at(lut, j * {n_codes} "
                    "+ element_at(codes, j + 1) + 1))"
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def sq_params(
    embeddings: DataFrame,
    vec_col: str = "embedding",
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the L2-NORMALIZED corpus — the
    scalar-quantization codec parameters.  One aggregation over the
    normalized vectors (in-array transform, JVM-side), two
    dim-length driver lists — O(d), never O(corpus)."""
    dim = len(embeddings.select(vec_col).first()[0])
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    nv = embeddings.select(
        F.transform(
            F.col(vec_col), lambda x: x.cast("double") / F.greatest(norm, F.lit(1e-12))
        ).alias("nv")
    )
    agg = nv.agg(
        *[F.min(F.element_at("nv", i + 1)).alias(f"mn{i}") for i in range(dim)],
        *[F.max(F.element_at("nv", i + 1)).alias(f"mx{i}") for i in range(dim)],
    ).collect()[0]
    return (
        [agg[f"mn{i}"] for i in range(dim)],
        [agg[f"mx{i}"] for i in range(dim)],
    )


def sq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized (int8) approximate top-k: each normalized
    dimension maps to 0..255 by the corpus per-dim (min, max) range —
    4x less memory traffic than float32 (the simplest compressed-scan
    tier; PQ is the next).  Candidates score against the DEQUANTIZED
    int8 codes with the exact-cosine machinery, so the only error is
    quantization rounding.

    Everything JVM-side: quantize = in-array transform to int, score =
    the same `aggregate` dot product `cosine_topk` uses, broadcast
    query side, per-query top-k window.  Deterministic: quantization
    is floor on exact-operand doubles; dequantized values are a fixed
    affine map of the codes.
    """
    mn, mx = sq_params(embeddings, vec_col=vec_col)
    dim = len(mn)
    mn_arr = F.array(*[F.lit(v) for v in mn])
    scale = F.array(
        *[F.lit((mx[i] - mn[i]) / 255.0 if mx[i] > mn[i] else 1.0) for i in range(dim)]
    )
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )

    def dequant(df: DataFrame, out: str) -> DataFrame:
        # codes = floor((nv - mn) / scale) clamped to [0, 255];
        # dequant = mn + (code + 0.5) * scale
        nv = F.transform(
            F.col(vec_col), lambda x: x.cast("double") / F.greatest(norm, F.lit(1e-12))
        )
        codes = F.zip_with(
            nv,
            F.arrays_zip(mn_arr.alias("mn"), scale.alias("sc")),
            lambda v, p: F.greatest(
                F.lit(0),
                F.least(
                    F.lit(255),
                    F.floor((v - p["mn"]) / p["sc"]).cast("int"),
                ),
            ),
        )
        deq = F.zip_with(
            codes,
            F.arrays_zip(mn_arr.alias("mn"), scale.alias("sc")),
            lambda c, p: p["mn"] + (c.cast("double") + 0.5) * p["sc"],
        )
        return df.select(F.col(id_col), deq.alias(out))

    corpus = dequant(embeddings, "_cv").select(
        F.col(id_col).alias("neighbor_id"), "_cv"
    )
    qs = dequant(queries, "_qv").select(F.col(id_col).alias("query_id"), "_qv")
    scored = (
        corpus.join(F.broadcast(qs))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(
                _dot(F.col("_cv"), F.col("_qv"))
                / (_norm(F.col("_cv")) * _norm(F.col("_qv"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
