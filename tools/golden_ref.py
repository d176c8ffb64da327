"""Spark-free reference implementations for the golden oracles.

Each ``ref_q_*`` function recomputes one of the driver queries that no
plain-SQL DuckDB oracle can express (sketches, LSH/IVF, the KG-extract
corpus path) using ONLY numpy / pandas / the pure-Python parse core —
no SparkSession anywhere.  ``tools/make_goldens.py`` materializes the
results as JSON goldens that ``__spark_entry__.oracle_sql()`` renders
into ``VALUES`` literals for the driver's DuckDB cross-check.

Why this is a meaningful oracle: the Spark queries run the same
*algorithms* (they must, to be comparable bit-for-bit) but through a
completely different execution path — Arrow batches, shuffles,
window-capped self-joins, distributed large-star/small-star connected
components vs. this module's single-threaded loops and a classic
union-find.  What the comparison pins down is everything Spark-side:
span assembly, UDF batching, join/dedup/window semantics, aggregation,
and ordering.  The parse core itself is pinned independently by the 42
reference goldens (scanner/scanner_test.go:11-1417).

Determinism notes mirrored from the operators:
* ``xxh64_str`` is the public XXH64 spec at seed 42 — byte-compatible
  with Spark's ``xxhash64`` on strings (cross-checked by pytest);
* float reductions replicate Spark's fold order: ``F.aggregate`` is a
  strict left fold, so dot products/norms here are sequential Python
  loops over float64, never ``np.sum`` (pairwise summation rounds
  differently);
* ``spark_round`` is HALF_UP on the shortest-repr decimal — the
  semantics of both Spark's ``F.round`` and DuckDB's ``ROUND``.
"""

from __future__ import annotations

import math
import random
import struct
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

# --------------------------------------------------------------------------
# XXH64 (public spec, seed 42 = Spark's xxhash64)
# --------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round64(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round64(0, val)
    return (acc * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 over ``data``; returns Spark's signed-int64 value."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while pos + 32 <= n:
            a, b, c, d = struct.unpack_from("<QQQQ", data, pos)
            v1, v2, v3, v4 = (
                _round64(v1, a), _round64(v2, b), _round64(v3, c), _round64(v4, d)
            )
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, pos)
        h ^= _round64(0, k1)
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        (k1,) = struct.unpack_from("<I", data, pos)
        h ^= (k1 * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = 42) -> int:
    return xxh64(s.encode("utf-8"), seed)


def pmod(x: int, m: int) -> int:
    return x % m if x % m >= 0 else x % m + m  # Python % already floors; kept explicit


# --------------------------------------------------------------------------
# numeric semantics shared with the Spark operators
# --------------------------------------------------------------------------

def spark_round(x: float, digits: int) -> float:
    """HALF_UP round on shortest-repr decimal (Spark F.round / DuckDB ROUND)."""
    if x is None or math.isnan(x) or math.isinf(x):
        return x
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def seq_dot(a, b) -> float:
    """Left-fold dot product — F.aggregate(zip_with(...)) order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def seq_norm(a) -> float:
    acc = 0.0
    for x in a:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


# --------------------------------------------------------------------------
# sketch primitives (sequential re-statements of functions/hashing.py spec)
# --------------------------------------------------------------------------

_M61 = (1 << 61) - 1
_SHINGLE_BASE = 1_000_003
_GOLDEN = 0x9E3779B97F4A7C15


def char_shingles(text: str, k: int) -> np.ndarray:
    """Distinct k-byte polynomial shingle hashes (uint64 wraparound)."""
    data = text.encode("utf-8", "ignore")
    n = len(data) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    out = set()
    powers = [pow(_SHINGLE_BASE, j, 1 << 64) for j in range(k)]
    for i in range(n):
        h = 0
        for j in range(k):
            h = (h + data[i + j] * powers[j]) & _M64
        out.add(h)
    return np.array(sorted(out), dtype=np.uint64)


def fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8", "ignore"):
        h = ((h ^ byte) * 0x100000001B3) & _M64
    return h


def minhash_perm_coeffs(num_perm: int, seed: int = 7):
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _M61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rs.randint(0, _M61, size=num_perm, dtype=np.uint64)
    return [int(x) for x in a], [int(x) for x in b]


def minhash_sig(shingles: np.ndarray, a: list[int], b: list[int]) -> list[int]:
    """Bitwise mirror of ``minhash_signatures_batch``: the engine's
    ``(a * x + b) % M61`` runs in numpy uint64, so the product and the
    sum WRAP mod 2^64 before the Mersenne mod — Python's exact big-int
    product diverges (caught when the pipeline-lineage golden exposed
    raw candidate counts; the verified-edge goldens agreed either way
    because exact Jaccard verification absorbs candidate-set drift)."""
    if shingles.size == 0:
        return [_M61] * len(a)
    xs = [int(s) % _M61 for s in shingles]
    return [
        min((((ai * x) & _M64) + bi & _M64) % _M61 for x in xs)
        for ai, bi in zip(a, b)
    ]


def band_fold(signature: list[int], bands: int) -> list[int]:
    rows = len(signature) // bands
    out = []
    for b in range(bands):
        h = 1469598103934665603
        for v in signature[b * rows : (b + 1) * rows]:
            h = ((h ^ (v & _M64)) * 1099511628211) & _M64
        out.append(int((h ^ ((b * _GOLDEN) & _M64)) & 0x7FFFFFFFFFFFFFFF))
    return out


def simhash64(text: str) -> int:
    words = text.split()
    if not words:
        return 0
    sums = [0] * 64
    for w in words:
        h = fnv1a64(w)
        for i in range(64):
            sums[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if sums[i] > 0:
            out |= 1 << i
    return out & 0x7FFFFFFFFFFFFFFF


def rolling_fingerprint(text: str, window: int = 64) -> int:
    k = min(window, max(len(text), 1))
    h = char_shingles(text, k)
    if h.size == 0:
        return fnv1a64(text) & 0x7FFFFFFFFFFFFFFF  # int64-masked, as the engine
    return int(int(h.min()) & 0x7FFFFFFFFFFFFFFF)


def jaccard_shingles(x: str, y: str, k: int) -> float:
    hx = set(int(v) for v in char_shingles(x, k))
    hy = set(int(v) for v in char_shingles(y, k))
    union = len(hx | hy)
    return (len(hx & hy) / union) if union else 1.0


# --------------------------------------------------------------------------
# corpus + parse helpers (pure Python)
# --------------------------------------------------------------------------

def _corpus_docs(n_docs: int, seed: int = 42):
    """(doc_id, spans) rows exactly as generate_docs emits them."""
    from turtle_spark.sources.corpus import build_doc, fixture_texts

    fixtures = fixture_texts()
    return [build_doc(i, seed, fixtures) for i in range(n_docs)]


def _fixture_docs():
    from turtle_spark.sources.corpus import _load_fixture_cases

    cases = _load_fixture_cases()
    return [
        (name, [("text", cases[name]["turtle"], "", 0)]) for name in sorted(cases)
    ]


def _assemble(spans) -> str:
    ordered = sorted(spans, key=lambda s: s[3])
    return "\n".join(s[1] for s in ordered if s[0] == "text")


DOC_IRI_PREFIX = "http://turtle-spark.dev/doc/"
HAS_MEDIA = "http://turtle-spark.dev/ns#hasMedia"


def _extract_all(docs) -> list[tuple]:
    """(doc_id, seq, s, p, o, label, datatype, objecttype) rows incl.
    media triples, blank nodes globalized."""
    from turtle_spark.core.parser import parse_document

    rows = []
    for doc_id, spans in docs:
        triples = parse_document(_assemble(spans)).triples
        for seq, t in enumerate(triples):
            s, p, o, label, datatype, otype = t
            if s.startswith("_:"):
                s = f"_:{doc_id}#{s[2:]}"
            if otype == "iri" and o.startswith("_:"):
                o = f"_:{doc_id}#{o[2:]}"
            rows.append((doc_id, seq, s, p, o, label, datatype, otype))
        for kind, _text, ref, _off in spans:
            if kind == "media":
                rows.append(
                    (doc_id, -1, DOC_IRI_PREFIX + doc_id, HAS_MEDIA, ref, "", "", "iri")
                )
    return rows


# --------------------------------------------------------------------------
# the ten reference queries
# --------------------------------------------------------------------------

def ref_q_kg_extract() -> tuple[list[str], list[tuple]]:
    docs = _corpus_docs(200) + _fixture_docs()
    rows = _extract_all(docs)
    by_type: dict[str, tuple[int, set]] = {}
    for r in rows:
        n, subs = by_type.setdefault(r[7], (0, set()))
        by_type[r[7]] = (n + 1, subs)
        subs.add(r[2])
    out = [(t, n, len(subs)) for t, (n, subs) in sorted(by_type.items())]
    return ["objecttype", "n_triples", "n_subjects"], out


def ref_q_triples_two_hop() -> tuple[list[str], list[tuple]]:
    """2-hop path counts per predicate pair — nested dict-lookup loop
    (independent of Spark's join machinery): index triples by subject,
    then for every iri-object triple walk its object's outgoing
    predicates."""
    docs = _corpus_docs(200) + _fixture_docs()
    rows = _extract_all(docs)
    by_subject: dict[str, list[str]] = {}
    for r in rows:
        by_subject.setdefault(r[2], []).append(r[3])
    counts: dict[tuple[str, str], int] = {}
    for r in rows:
        if r[7] != "iri":
            continue
        for p2 in by_subject.get(r[4], ()):
            key = (r[3], p2)
            counts[key] = counts.get(key, 0) + 1
    out = [(p1, p2, n) for (p1, p2), n in sorted(counts.items())]
    return ["p1", "p2", "n_paths"], out


def ref_q_serialize_roundtrip() -> tuple[list[str], list[tuple]]:
    from turtle_spark.core.parser import parse_document
    from turtle_spark.core.serializer import GraphBuffer

    seen = set()
    by_subject: dict[str, list] = {}
    for name, spans in _fixture_docs():
        for t in parse_document(_assemble(spans)).triples:
            key = tuple(t)
            if key in seen:
                continue
            seen.add(key)
            by_subject.setdefault(t[0], []).append(t)
    agg: dict[str, tuple[int, int]] = {}
    for subject, triples in by_subject.items():
        g = GraphBuffer()
        for s, p, o, label, datatype, otype in triples:
            g.accept_annotated(s, p, o, label, datatype, otype)
        block = g.render(include_pragmas=False)
        initial = subject[0]
        n, total = agg.get(initial, (0, 0))
        agg[initial] = (n + 1, total + len(block))
    out = [(i, n, total) for i, (n, total) in sorted(agg.items())]
    return ["subject_initial", "n_subjects", "total_bytes"], out


def _minhash_edges(documents) -> list[tuple[int, int, float]]:
    """(src, dst, jaccard) with ORIGINAL doc ids, src < dst —
    dedup.minhash_near_duplicates semantics: threshold 0.5, shingle_k
    5, 128 perms, 32 bands, bucket cap 200 (capping ranks by the
    internal xxhash64 term id, as the engine does)."""
    a, b = minhash_perm_coeffs(128, seed=7)
    terms = {xxh64_str(str(doc_id)): (doc_id, text) for doc_id, text in documents}
    buckets: dict[tuple[int, int], list[int]] = {}
    for tid, (_doc, text) in terms.items():
        sig = minhash_sig(char_shingles(text or "", 5), a, b)
        for band_index, band_hash in enumerate(band_fold(sig, 32)):
            buckets.setdefault((band_index, band_hash), []).append(tid)
    pairs = set()
    for members in buckets.values():
        members = sorted(members)[:200]  # deterministic bucket cap
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    out = []
    for t1, t2 in sorted(pairs):
        (d1, x), (d2, y) = terms[t1], terms[t2]
        jac = jaccard_shingles(x or "", y or "", 5)
        if jac >= 0.5:
            out.append((min(d1, d2), max(d1, d2), jac))
    out.sort()
    return out


def _read_documents(sf_dir: str):
    import pandas as pd

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    return list(zip(d["doc_id"].tolist(), d["text"].tolist()))


def ref_q_minhash_dedup_docs(sf_dir: str) -> tuple[list[str], list[tuple]]:
    return ["src", "dst", "jaccard"], _minhash_edges(_read_documents(sf_dir))


def ref_q_simhash_dedup_docs(sf_dir: str) -> tuple[list[str], list[tuple]]:
    docs = _read_documents(sf_dir)
    hashes = {doc_id: simhash64(text or "") for doc_id, text in docs}
    buckets: dict[tuple[int, int], list] = {}
    for doc_id, h in hashes.items():
        for band in range(4):
            chunk = (h >> (band * 16)) & 0xFFFF
            buckets.setdefault((band, chunk), []).append(doc_id)
    pairs = set()
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(len(members)):
                if members[i] < members[j]:
                    pairs.add((members[i], members[j]))
    out = []
    for id1, id2 in sorted(pairs):
        ham = bin(hashes[id1] ^ hashes[id2]).count("1")
        if ham <= 6:
            out.append((id1, id2, ham))
    return ["id1", "id2", "hamming"], out


def ref_q_doc_fingerprints(sf_dir: str) -> tuple[list[str], list[tuple]]:
    docs = _read_documents(sf_dir)
    out = [
        (doc_id, rolling_fingerprint(text or ""), simhash64(text or ""))
        for doc_id, text in docs
    ]
    return ["doc_id", "fingerprint", "simhash"], out


def _read_embeddings(sf_dir: str):
    import pandas as pd

    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    # the Spark queries cast array<float> -> array<double> up front
    return [
        (int(vid), np.asarray(vec, dtype=np.float32).astype(np.float64))
        for vid, vec in zip(e["vec_id"].tolist(), e["embedding"].tolist())
    ]


def _topk_rerank(cands: dict[int, set[int]], vecs: dict[int, np.ndarray], k: int):
    """Exact cosine re-rank + per-query top-k (cosine desc, id asc)."""
    out = []
    for qid in sorted(cands):
        scored = []
        for nid in cands[qid]:
            cos = spark_round(
                seq_dot(vecs[nid], vecs[qid]) / (seq_norm(vecs[nid]) * seq_norm(vecs[qid])),
                6,
            )
            scored.append((-cos, nid))
        scored.sort()
        for rank, (negcos, nid) in enumerate(scored[:k], start=1):
            out.append((qid, nid, -negcos, rank))
    return out


def ref_q_lsh_topk(sf_dir: str) -> tuple[list[str], list[tuple]]:
    emb = _read_embeddings(sf_dir)
    vecs = dict(emb)
    dim = len(emb[0][1])
    queries = [vid for vid, _ in emb if vid < 3]
    cands: dict[int, set[int]] = {q: set() for q in queries}
    for t in range(8):  # n_tables=8, n_bits=4, seeds 13..20
        planes = np.random.RandomState(13 + t).standard_normal((4, dim)).astype(np.float32)
        p64 = planes.astype(np.float64)
        weights = [1 << i for i in range(4)]

        def bucket(v) -> int:
            proj = p64 @ v
            return sum(w for w, p in zip(weights, proj) if p > 0)

        table: dict[int, list[int]] = {}
        for vid, v in emb:
            table.setdefault(bucket(v), []).append(vid)
        for q in queries:
            for vid in table.get(bucket(vecs[q]), []):
                if vid != q:
                    cands[q].add(vid)
    return ["query_id", "neighbor_id", "cosine", "rank"], _topk_rerank(cands, vecs, 5)


def ref_q_ivf_topk(sf_dir: str) -> tuple[list[str], list[tuple]]:
    emb = _read_embeddings(sf_dir)
    vecs = dict(emb)
    queries = [vid for vid, _ in emb if vid < 3]
    # deterministic sample: (xxhash64(str(id)), id) order, cap 4096
    ordered = sorted(emb, key=lambda t: (xxh64_str(str(t[0])), t[0]))[:4096]
    sample = np.stack([v for _, v in ordered]).astype(np.float32)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rs = np.random.RandomState(13)
    n_centroids = 8
    centroids = sample[rs.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(8):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
    cents64 = centroids.astype(np.float64)

    def probe(v, n_probe: int) -> list[int]:
        x = v / max(float(np.linalg.norm(v)), 1e-12)
        sims = cents64 @ x
        return list(np.argsort(-sims)[:n_probe])

    cells: dict[int, list[int]] = {}
    for vid, v in emb:
        cells.setdefault(probe(v, 1)[0], []).append(vid)
    cands: dict[int, set[int]] = {}
    for q in queries:
        s = set()
        for c in probe(vecs[q], 4):
            s.update(cells.get(c, []))
        s.discard(q)
        cands[q] = s
    return ["query_id", "neighbor_id", "cosine", "rank"], _topk_rerank(cands, vecs, 5)


def ref_q_pq_topk(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Independent mirror of operators/similarity.py::pq_topk (m=8
    subspaces, 16 codes, seed 29): per-subspace L2 k-means codebooks
    from the deterministic (xxh64(str(id)), id)-ordered sample, per-
    vector encoding, ADC scoring via a per-query LUT with a Python
    left-fold sum matching Spark's `aggregate` fold order."""
    emb = _read_embeddings(sf_dir)
    queries = [vid for vid, _ in emb if vid < 3]
    m, n_codes, seed, k = 8, 16, 29, 5
    ordered = sorted(emb, key=lambda t: (xxh64_str(str(t[0])), t[0]))[:4096]
    sample = np.stack([v for _, v in ordered]).astype(np.float32)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    d = sample.shape[1]
    dsub = d // m
    books = []
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        rs = np.random.RandomState(seed + j)
        cb = sub[rs.choice(len(sub), size=min(n_codes, len(sub)), replace=False)].copy()
        for _ in range(8):
            d2 = (cb**2).sum(axis=1)[None, :] - 2.0 * (sub @ cb.T)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cb)):
                members = sub[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books.append(cb)
    b64 = [cb.astype(np.float64) for cb in books]

    def norm64(v) -> np.ndarray:
        x = np.asarray(v, dtype=np.float64)
        return x / max(float(np.linalg.norm(x)), 1e-12)

    def encode(v) -> list[int]:
        x = norm64(v)
        # batch-of-one through the same (1, dsub) @ (dsub, n_codes)
        # matmul shape the engine's Arrow batches use
        codes = []
        for j in range(m):
            sub = x[j * dsub : (j + 1) * dsub][None, :]
            d2 = (b64[j] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ b64[j].T)
            codes.append(int(np.argmin(d2[0])))
        return codes

    corpus = [(vid, encode(v)) for vid, v in emb]
    out = []
    for qid in queries:
        q = norm64(dict(emb)[qid])
        lut = np.concatenate([b64[j] @ q[j * dsub : (j + 1) * dsub] for j in range(m)])
        scored = []
        for nid, codes in corpus:
            if nid == qid:
                continue
            s = 0.0
            for j in range(m):
                s += float(lut[j * n_codes + codes[j]])
            scored.append((-spark_round(s, 6), nid))
        scored.sort()
        for rank, (negs, nid) in enumerate(scored[:k], start=1):
            out.append((qid, nid, -negs, rank))
    return ["query_id", "neighbor_id", "score", "rank"], out


def ref_q_sq_topk(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Scalar-quantized (int8) top-k — python mirror of
    operators/similarity.py::sq_topk: same left-fold norms, same
    per-dim (min, max) codec, same floor quantization and affine
    dequantization, exact-cosine re-rank on the dequantized codes."""
    import math

    emb = _read_embeddings(sf_dir)
    queries = [vid for vid, _ in emb if vid < 3]

    def normed(v) -> list[float]:
        n = max(seq_norm(v), 1e-12)
        return [float(x) / n for x in v]

    nvs = {vid: normed(v) for vid, v in emb}
    dim = len(emb[0][1])
    mn = [min(nv[i] for nv in nvs.values()) for i in range(dim)]
    mx = [max(nv[i] for nv in nvs.values()) for i in range(dim)]
    sc = [(mx[i] - mn[i]) / 255.0 if mx[i] > mn[i] else 1.0 for i in range(dim)]

    def dequant(nv) -> list[float]:
        out = []
        for i, v in enumerate(nv):
            c = min(255, max(0, int(math.floor((v - mn[i]) / sc[i]))))
            out.append(mn[i] + (c + 0.5) * sc[i])
        return out

    dq = {vid: dequant(nv) for vid, nv in nvs.items()}
    out = []
    for qid in queries:
        q = dq[qid]
        scored = []
        for nid, v in dq.items():
            if nid == qid:
                continue
            cos = spark_round(seq_dot(v, q) / (seq_norm(v) * seq_norm(q)), 6)
            scored.append((-cos, nid))
        scored.sort()
        for rank, (negc, nid) in enumerate(scored[:5], start=1):
            out.append((qid, nid, -negc, rank))
    return ["query_id", "neighbor_id", "score", "rank"], out


def _synth_image_pixels(w: int, h: int, s0: int, s1: int, s2: int) -> np.ndarray:
    """Independent reimplementation of the engine's synthetic test
    pattern: channel c at (row, col) = (seed_c + 31*row + 7*col) % 256.
    Written with explicit loops on purpose — no shared code path with
    `turtle_spark.functions.imaging.synth_pixels`."""
    img = np.empty((h, w, 3), dtype=np.uint8)
    for row in range(h):
        for col in range(w):
            base = 31 * row + 7 * col
            img[row, col, 0] = (s0 + base) % 256
            img[row, col, 1] = (s1 + base) % 256
            img[row, col, 2] = (s2 + base) % 256
    return img


def _synth_audio_samples(n: int, sa: int, sb: int) -> list[int]:
    """Independent reimplementation of the engine's waveform spec
    (functions/audio.py): pure-Python big-int arithmetic, no numpy,
    no shared code path."""
    return [
        ((i * 2654435761 * (sa + 1) + sb) % 65536) - 32768
        for i in range(1, n + 1)
    ]


def _corpus_media(n_docs: int = 200, seed: int = 42):
    """(media_ref, doc_id, media_type, payload_len, duration_ms,
    image_or_none, audio_or_none, video_or_none) rows; audio_or_none
    is (sample_rate, samples); video_or_none is (frames, frame_ms)
    and the image slot of a video row carries the vertical FRAME
    STACK (the engine's media_decoder computes pixel features of the
    concatenated frames, so the shared image branch applies).

    Payload byte-lengths are derived ANALYTICALLY from the container
    specs (PPM: ASCII header + 3wh raster; BMP: 54-byte headers +
    4-byte-aligned rows; WAV: 44-byte canonical header + 2 bytes per
    sample; PVID: 12-byte header + n_frames PPM frames) rather than
    by calling the engine's encoders — so `total_bytes` independently
    checks the encoders' output sizes."""
    out = []
    for doc_id, spans in _corpus_docs(n_docs, seed):
        for kind, _text, ref, _off in spans:
            if kind != "media":
                continue
            h = xxh64_str(ref)
            mtype = ("image", "audio", "video")[h % 3]
            if mtype == "image":
                dur = h % 600000 + 1
                w, hgt = h % 40 + 8, h % 24 + 8
                img = _synth_image_pixels(w, hgt, h % 256, h % 251, h % 241)
                if h % 2 == 0:  # PPM
                    plen = len(f"P6\n{w} {hgt}\n255\n") + 3 * w * hgt
                else:  # BMP: 14+40 headers, rows padded to 4 bytes
                    plen = 54 + ((3 * w + 3) & ~3) * hgt
                out.append((ref, doc_id, mtype, plen, dur, img, None, None))
            elif mtype == "audio":
                rate = (8000, 16000)[h % 2]
                n = h % 4000 + 400
                samples = _synth_audio_samples(n, h % 256, h % 251)
                out.append(
                    (ref, doc_id, mtype, 44 + 2 * n, n * 1000 // rate,
                     None, (rate, samples), None)
                )
            else:
                nf = h % 4 + 2
                fms = (250, 500)[h % 2]
                w, hgt = h % 24 + 8, h % 16 + 8
                frames = [
                    _synth_image_pixels(
                        w, hgt, (h % 256 + 17 * f) % 256, h % 251, h % 241
                    )
                    for f in range(nf)
                ]
                plen = 12 + nf * (len(f"P6\n{w} {hgt}\n255\n") + 3 * w * hgt)
                stack = np.concatenate(frames, axis=0)
                out.append(
                    (ref, doc_id, mtype, plen, nf * fms, stack, None,
                     (frames, fms))
                )
    return out


def _audio_feature_stats(rate: int, samples: list[int]) -> tuple[float, ...]:
    """(duration_s, rms, peak, zcr) per the engine's feature layout —
    float64 math, one float32 cast at the end, independently coded."""
    x = np.asarray(samples, dtype=np.float64)
    n = x.size
    dur = float(np.float32(n / float(rate)))
    rms = float(np.float32(float(np.sqrt(np.mean(x * x))) / 32768.0))
    peak = float(np.float32(float(np.max(np.abs(x))) / 32768.0))
    s = np.sign(x)
    s[s == 0] = 1.0
    zcr = float(np.float32(float(np.count_nonzero(s[1:] != s[:-1])) / (n - 1)))
    return dur, rms, peak, zcr


def ref_q_media_features() -> tuple[list[str], list[tuple]]:
    agg: dict[str, tuple[int, int, list[float], list[float]]] = {}
    for ref, _doc, mtype, plen, _dur, img, aud, _vid in _corpus_media():
        if img is not None:
            # engine spec: f0 = w/1024, f2 = mean(R)/255, float64 math
            # cast to float32 once at the end
            f0 = float(np.float32(img.shape[1] / 1024.0))
            mean_r = float(img[:, :, 0].astype(np.float64).mean())
            px = float(np.float32(mean_r / 255.0))
        elif aud is not None:
            # engine spec: f0 = duration seconds, f2 = peak/32768
            f0, _rms, px, _zcr = _audio_feature_stats(*aud)
        else:  # every corpus row now decodes for real (image/stack/audio)
            raise AssertionError("corpus media row with neither pixels nor samples")
        n, total, f0s, pxs = agg.setdefault(mtype, (0, 0, [], []))
        agg[mtype] = (n + 1, total + plen, f0s, pxs)
        f0s.append(spark_round(f0, 4))
        pxs.append(spark_round(px, 4))
    out = [
        (t, n, total, spark_round(math.fsum(f0s), 4), spark_round(math.fsum(pxs), 4))
        for t, (n, total, f0s, pxs) in sorted(agg.items())
    ]
    return (
        ["media_type", "n_media", "total_bytes", "f0_sum", "px_mean_sum"],
        out,
    )


def ref_q_audio_stats() -> tuple[list[str], list[tuple]]:
    """Real WAV decode stats per audio row: the engine synthesizes a
    PCM16 waveform, encodes RIFF/WAVE bytes, decodes them back through
    the Arrow seam, and computes signal statistics; this golden
    recomputes the same stats from an independent big-int reimplementation
    of the waveform spec — any encode/decode defect breaks parity."""
    out = []
    for ref, _doc, mtype, plen, dur, _img, aud, _vid in sorted(
        _corpus_media(), key=lambda t: t[0]
    ):
        if aud is None:
            continue
        dur_s, rms, peak, zcr = _audio_feature_stats(*aud)
        out.append(
            (ref, dur, plen, spark_round(dur_s, 4), spark_round(rms, 4),
             spark_round(peak, 4), spark_round(zcr, 4))
        )
    return (
        ["media_ref", "duration_ms", "n_bytes", "duration_s", "rms", "peak", "zcr"],
        out,
    )


def ref_q_flac_audio() -> tuple[list[str], list[tuple]]:
    """Lossless WAV -> FLAC transcode stats: the engine re-encodes every
    audio payload as FLAC (functions/flac.py) and reports signal stats
    computed FROM THE FLAC-DECODED SAMPLES; this golden recomputes the
    same stats from the waveform spec alone and asserts lossless=true —
    if the FLAC round trip drops or alters one sample, the engine's
    stats (or its losslessness verdict) break parity."""
    out = []
    for ref, _doc, mtype, plen, _dur, _img, aud, _vid in sorted(
        _corpus_media(), key=lambda t: t[0]
    ):
        if aud is None:
            continue
        dur_s, rms, peak, zcr = _audio_feature_stats(*aud)
        out.append(
            (ref, plen, True, spark_round(dur_s, 4), spark_round(rms, 4),
             spark_round(peak, 4), spark_round(zcr, 4))
        )
    return (
        ["media_ref", "n_wav_bytes", "lossless", "duration_s", "rms", "peak", "zcr"],
        out,
    )


def ref_q_frame_sample() -> tuple[list[str], list[tuple]]:
    """Real frame sampling — independently splits each video's frame
    list, keeps frames on the 500 ms grid, and recomputes the exact
    integer pixel sum per retained frame."""
    out = []
    for ref, _doc, _mtype, _plen, _dur, _img, _aud, vid in sorted(
        _corpus_media(), key=lambda t: t[0]
    ):
        if vid is None:
            continue
        frames, fms = vid
        for idx, frame in enumerate(frames):
            ts = idx * fms
            if ts % 500 != 0:
                continue
            px_sum = int(np.asarray(frame, dtype=np.int64).sum())
            out.append((ref, idx, ts, px_sum))
    return ["media_ref", "frame_index", "ts_ms", "px_sum"], out


def ref_q_dedup_clusters(sf_dir: str) -> tuple[list[str], list[tuple]]:
    edges = _minhash_edges(_read_documents(sf_dir))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for src, dst, _ in edges:
        ra, rb = find(src), find(dst)
        if ra != rb:
            parent[ra] = rb
    sizes: dict[int, int] = {}
    for node in list(parent):
        root = find(node)
        sizes[root] = sizes.get(root, 0) + 1
    hist: dict[int, int] = {}
    for s in sizes.values():
        hist[s] = hist.get(s, 0) + 1
    return ["cluster_size", "n_clusters"], sorted(hist.items())


def ref_q_bpe_vocab(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """BPE merge table — independent Counter-based trainer: ASCII-
    whitespace words (len <= 64), symbols = chars + '</w>', 20 merges,
    argmax by (count desc, left asc, right asc), merges applied with a
    left-greedy scan (mirrors the engine's fold semantics)."""
    import re
    from collections import Counter

    wordfreq = Counter()
    for _doc_id, text in _read_documents(sf_dir):
        for w in re.split(r"[ \t\n\r]+", text or ""):
            if 0 < len(w) <= 64:
                wordfreq[w] += 1
    words = [(list(w) + ["</w>"], n) for w, n in wordfreq.items()]

    out: list[tuple] = []
    for rank in range(1, 21):
        pairs: Counter = Counter()
        for toks, n in words:
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += n
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, a, b, a + b, n))
        new_words = []
        for toks, freq in words:
            merged: list[str] = []
            for t in toks:
                if merged and merged[-1] == a and t == b:
                    merged[-1] = a + b
                else:
                    merged.append(t)
            new_words.append((merged, freq))
        words = new_words
    return ["rank", "left", "right", "merged", "pair_freq"], out


def ref_q_bpe_encode(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """BPE apply — train with the independent Counter trainer (same
    spec as ref_q_bpe_vocab), then encode each document: words in
    rank order through the left-greedy rewrite, words over 64 chars
    pass through as single opaque tokens; fingerprint = first 16 hex
    of md5 over the space-joined token sequence."""
    import hashlib
    import re

    _cols, merges = ref_q_bpe_vocab(sf_dir)
    ordered = [(m[1], m[2], m[3]) for m in merges]
    cache: dict[str, list[str]] = {}

    def encode_word(w: str) -> list[str]:
        got = cache.get(w)
        if got is not None:
            return got
        if len(w) > 64:
            toks = [w]
        else:
            toks = list(w) + ["</w>"]
            for a, b, m in ordered:
                out: list[str] = []
                for t in toks:
                    if out and out[-1] == a and t == b:
                        out[-1] = m
                    else:
                        out.append(t)
                toks = out
        cache[w] = toks
        return toks

    rows: list[tuple] = []
    for doc_id, text in _read_documents(sf_dir):
        words = [w for w in re.split(r"[ \t\n\r]+", text or "") if w]
        toks: list[str] = []
        for w in words:
            toks.extend(encode_word(w))
        fp = hashlib.md5(" ".join(toks).encode()).hexdigest()[:16]
        rows.append((doc_id, len(words), len(toks), fp))
    rows.sort()
    return ["doc_id", "n_words", "n_tokens", "tok_fp"], rows


def ref_q_leakage_split(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Leakage-safe split — MinHash edges + union-find canonical map
    (independent loops, as ref_q_dedup_clusters), then the documented
    cumulative-md5-cutoff rule: h = md5('split|' + str(group))[:8],
    train if h < hex(round(0.8*2^32)), val if h < hex(round(cum2^32))
    with cum accumulated in float exactly as the engine does, else
    test."""
    import hashlib

    docs = _read_documents(sf_dir)
    edges = _minhash_edges(docs)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for src, dst, _ in edges:
        ra, rb = find(src), find(dst)
        if ra != rb:
            parent[ra] = rb
    canon: dict[int, int] = {}
    comps: dict[int, list[int]] = {}
    for node in list(parent):
        comps.setdefault(find(node), []).append(node)
    for members in comps.values():
        m = min(members)
        for n in members:
            canon[n] = m

    cuts = []
    cum = 0.0
    for frac in (0.8, 0.1):  # engine's forward float accumulation
        cum += frac
        cuts.append(format(int(round(cum * (1 << 32))), "08x"))

    out: list[tuple] = []
    for doc_id, _text in docs:
        gk = canon.get(doc_id, doc_id)
        h = hashlib.md5(f"split|{gk}".encode()).hexdigest()[:8]
        split = "train" if h < cuts[0] else ("val" if h < cuts[1] else "test")
        out.append((doc_id, gk, split))
    out.sort()
    return ["doc_id", "group_key", "split"], out


def ref_q_semdedup(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """SemDeDup (Abbas et al. 2023) — independent loops+union-find
    mirror of operators/semdedup.py: float32 k-means on the seeded
    xxh64-ordered sample, nearest-centroid assignment, centroid
    cosine via the engine's documented LEFT-FOLD order (seq_dot, not
    numpy BLAS — the engine computes csim JVM-side so the fold order
    is pinned), within-cluster pairs capped by smallest id, cosine
    >= 0.35 edges, union-find components, keep = (min csim, min id)
    per component."""
    emb = _read_embeddings(sf_dir)
    vecs = dict(emb)
    ordered = sorted(emb, key=lambda t: (xxh64_str(str(t[0])), t[0]))[:4096]
    sample = np.stack([v for _, v in ordered]).astype(np.float32)
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    rs = np.random.RandomState(13)
    n_centroids = 16
    centroids = sample[
        rs.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    ]
    for _ in range(8):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
    cents64 = centroids.astype(np.float64)

    cells: dict[int, list[int]] = {}
    csim: dict[int, float] = {}
    for vid, v in emb:
        x = v / max(float(np.linalg.norm(v)), 1e-12)
        c = int(np.argmax(cents64 @ x))
        cells.setdefault(c, []).append(vid)
        cent = cents64[c]
        csim[vid] = spark_round(
            seq_dot(v, cent) / (seq_norm(v) * seq_norm(cent)), 6
        )

    edges: list[tuple[int, int]] = []
    for c, ids in cells.items():
        ids = sorted(ids)[:4096]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                cos = spark_round(
                    seq_dot(vecs[a], vecs[b]) / (seq_norm(vecs[a]) * seq_norm(vecs[b])),
                    6,
                )
                if cos >= 0.35:
                    edges.append((a, b))

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[int, list[int]] = {}
    for node in list(parent):
        comps.setdefault(find(node), []).append(node)

    out: list[tuple] = []
    for members in comps.values():
        comp = min(members)
        keep = min(members, key=lambda n: (csim[n], n))
        for n in members:
            out.append((n, comp, keep, csim[n], n == keep))
    out.sort()
    return ["vec_id", "component", "keep_id", "csim", "kept"], out


# --------------------------------------------------------------------------
# KG graph analytics (operators/graph.py twins)
# --------------------------------------------------------------------------

_PR_SCALE = 1_000_000_000_000  # mirrors graph._SCALE


def _kg_entities(rows) -> list[str]:
    ents = {r[2] for r in rows} | {r[4] for r in rows if r[7] == "iri"}
    return sorted(ents)


def _dense_ids(entities: list[str], n_buckets: int = 64) -> dict[str, int]:
    """Mirror of graph.dense_entity_ids: hash-bucket, rank within
    bucket by entity string, add cumulative bucket offsets."""
    buckets: dict[int, list[str]] = {}
    for e in entities:
        buckets.setdefault(pmod(xxh64_str(e), n_buckets), []).append(e)
    ids, acc = {}, 0
    for b in range(n_buckets):
        for rank, e in enumerate(sorted(buckets.get(b, ()))):
            ids[e] = acc + rank
        acc += len(buckets.get(b, ()))
    return ids


def ref_q_predicate_profile() -> tuple[list[str], list[tuple]]:
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    per_pred: dict[str, dict] = {}
    for r in rows:
        p = per_pred.setdefault(
            r[3], {"n": 0, "subs": set(), "objs": set(), "fan": {}}
        )
        p["n"] += 1
        p["subs"].add(r[2])
        p["objs"].add(r[4])
        p["fan"].setdefault(r[2], set()).add(r[4])
    out = [
        (
            pred,
            p["n"],
            len(p["subs"]),
            len(p["objs"]),
            max(len(v) for v in p["fan"].values()),
            max(len(v) for v in p["fan"].values()) == 1,
        )
        for pred, p in sorted(per_pred.items())
    ]
    return (
        ["predicate", "n_triples", "n_subjects", "n_objects", "max_fanout", "is_functional"],
        out,
    )


def ref_q_pagerank_kg() -> tuple[list[str], list[tuple]]:
    """Fixed-point PageRank — plain dict loops vs the engine's
    join/groupBy iterations; integer arithmetic makes both exact."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    edges = sorted({(r[2], r[4]) for r in rows if r[7] == "iri" and r[2] != r[4]})
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: _PR_SCALE for n in nodes}
    base = 15 * _PR_SCALE // 100
    for _ in range(10):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // deg[s]
        rank = {n: base + 85 * inflow[n] // 100 for n in nodes}
    top = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return ["node", "rank_fp"], [(n, r) for n, r in top]


def ref_q_pagerank_incremental() -> tuple[list[str], list[tuple]]:
    """Warm-started PageRank maintenance between the two doc-hash
    snapshots — dict loops vs the engine's join/groupBy iterations;
    integer arithmetic keeps both exact."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())

    def snap_edges(excluded_residue: int) -> list[tuple[str, str]]:
        return sorted(
            {
                (r[2], r[4])
                for r in rows
                if r[7] == "iri"
                and r[2] != r[4]
                and pmod(xxh64_str(r[0] + "#snap"), 4) != excluded_residue
            }
        )

    def iterate(edges, rank: dict, iters: int) -> dict:
        nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
        deg: dict[str, int] = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        base = 15 * _PR_SCALE // 100
        rank = {n: rank.get(n, _PR_SCALE) for n in nodes}
        for _ in range(iters):
            inflow = {n: 0 for n in nodes}
            for s, d in edges:
                inflow[d] += rank[s] // deg[s]
            rank = {n: base + 85 * inflow[n] // 100 for n in nodes}
        return rank

    prev = iterate(snap_edges(0), {}, 10)
    warm = iterate(snap_edges(1), prev, 4)
    top = sorted(warm.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return ["node", "rank_fp"], [(n, r) for n, r in top]


def ref_q_shortest_paths() -> tuple[list[str], list[tuple]]:
    """Landmark shortest paths — heap dijkstra vs the engine's
    Bellman-Ford rounds; both exact over int64 weights."""
    import heapq

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    edges = sorted({(r[2], r[4]) for r in rows if r[7] == "iri" and r[2] != r[4]})
    wedges = [(s, d, 1 + pmod(xxh64_str(s + "|" + d), 9)) for s, d in edges]
    adj: dict[str, list[tuple[str, int]]] = {}
    for s, d, w in wedges:
        adj.setdefault(s, []).append((d, w))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    landmarks = [n for n in nodes if pmod(xxh64_str(n + "#landmark"), 600) == 0]
    out = []
    for lm in sorted(landmarks):
        dist = {lm: 0}
        heap = [(0, lm)]
        while heap:
            d, u = heapq.heappop(heap)
            if d > dist.get(u, 1 << 62):
                continue
            for v, w in adj.get(u, []):
                nd = d + w
                if nd < dist.get(v, 1 << 62):
                    dist[v] = nd
                    heapq.heappush(heap, (nd, v))
        fp = 0
        for n, d in dist.items():
            fp ^= xxh64_str(n + "|" + str(d))
        out.append(
            (lm, len(dist), max(dist.values()), sum(dist.values()), _signed64(fp))
        )
    return ["landmark", "n_reached", "max_dist", "sum_dist", "dist_fp"], out


def ref_q_entity_ids() -> tuple[list[str], list[tuple]]:
    """Hash-sampled slice of the dense entity dictionary (the full
    layout is pinned by pytest; the oracle checks per-entity ids)."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    ids = _dense_ids(_kg_entities(rows))
    out = [
        (e, i)
        for e, i in sorted(ids.items())
        if pmod(xxh64_str(e + "#sample"), 20) == 0
    ]
    return ["entity", "entity_id"], out


def ref_q_kg_negative_samples() -> tuple[list[str], list[tuple]]:
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    entities = _kg_entities(rows)
    ids = _dense_ids(entities)
    by_id = {i: e for e, i in ids.items()}
    n = len(entities)
    out = []
    for r in sorted({(r[2], r[3], r[4]) for r in rows if r[7] == "iri"}):
        s, p, o = r
        if pmod(xxh64_str(f"{s}|{p}|{o}|pick"), 10) != 0:
            continue
        draw = pmod(xxh64_str(f"{s}|{p}|{o}|0"), n)
        if draw == ids[o]:
            draw = (draw + 1) % n
        out.append((s, p, o, 0, by_id[draw]))
    return ["subject", "predicate", "true_object", "k", "neg_object"], out


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_NOTE_PRED = "http://example.org/stuff/1.0/note"
_U64 = (1 << 64) - 1


def ref_q_bgp_typed_links() -> tuple[list[str], list[tuple]]:
    """BGP { ?s rdf:type ?cls . ?s ?p ?o FILTER isIRI(?o) } aggregated
    per class — bag semantics (duplicate triples multiply bindings),
    mirroring the join the engine's bgp_select performs."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    links: dict[str, int] = {}
    for r in rows:
        if r[7] == "iri":
            links[r[2]] = links.get(r[2], 0) + 1
    agg: dict[str, list] = {}
    for r in rows:
        if r[3] == _RDF_TYPE and r[7] == "iri":
            c = links.get(r[2], 0)
            if c:
                e = agg.setdefault(r[4], [0, set()])
                e[0] += c
                e[1].add(r[2])
    out = [(cls, n, len(subs)) for cls, (n, subs) in sorted(agg.items())]
    return ["cls", "n_links", "n_entities"], out


def ref_q_bgp_note_chain() -> tuple[list[str], list[tuple]]:
    """BGP { ?s ?p ?b FILTER isIRI(?b) . ?b ex:note ?note } raw
    bindings (bag semantics), sorted."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    notes: dict[str, list[str]] = {}
    for r in rows:
        if r[3] == _NOTE_PRED and r[7] == "literal":
            notes.setdefault(r[2], []).append(r[4])
    out = []
    for r in rows:
        if r[7] == "iri" and r[4] in notes:
            for note in notes[r[4]]:
                out.append((r[2], r[3], note))
    return ["s", "p", "note"], sorted(out)


def ref_q_kg_closure() -> tuple[list[str], list[tuple]]:
    """Reachability closure of the entity graph (classic per-source
    BFS — independent of the engine's path-doubling joins), summarized
    for a deterministic 1-in-20 hash sample of sources as
    (src, n_reachable, XOR of xxhash64(dst))."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    adj: dict[str, set] = {}
    for r in rows:
        if r[7] == "iri" and r[2] != r[4]:
            adj.setdefault(r[2], set()).add(r[4])
    out = []
    for src in sorted(adj):
        if pmod(xxh64_str(src + "#closure"), 20) != 0:
            continue
        seen: set[str] = set()
        stack = [src]
        while stack:
            for v in adj.get(stack.pop(), ()):
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        fp = 0
        for d in seen:
            fp ^= xxh64_str(d) & _U64
        fp = fp - (1 << 64) if fp >= (1 << 63) else fp
        out.append((src, len(seen), fp))
    return ["src", "n_reachable", "dst_fp"], out


def ref_q_pack_sequences(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Bucketed next-fit sequence packing (max_tokens=256, 32 buckets)
    — plain dict/loop mirror of operators/chunking.pack_sequences.
    Token count mirrors Spark's split(trim(text), '\\s+'): trim strips
    ASCII spaces only, and re.ASCII makes Python's \\s the same class
    as Java's."""
    import re

    by_bucket: dict[int, list[tuple]] = {}
    for doc_id, text in _read_documents(sf_dir):
        t = (text or "").strip(" ")
        if not t:
            continue
        n = len(re.split(r"\s+", t, flags=re.ASCII))
        b = pmod(xxh64_str(str(doc_id)), 32)
        by_bucket.setdefault(b, []).append((doc_id, n))
    out = []
    for b, rows in by_bucket.items():
        rows.sort()
        seq = pos = run = 0
        for doc_id, n in rows:
            if n > 256:
                if pos > 0:
                    seq += 1
                out.append((doc_id, n, b, (b << 32) + seq, 0))
                seq, pos, run = seq + 1, 0, 0
                continue
            if run + n > 256 and pos > 0:
                seq, pos, run = seq + 1, 0, 0
            out.append((doc_id, n, b, (b << 32) + seq, pos))
            run += n
            pos += 1
    out.sort()
    return ["doc_id", "n_tokens", "bucket", "pack_id", "pack_pos"], out


from turtle_spark.functions.mixture import (  # noqa: E402
    MIXTURE_BUDGET,
    MIXTURE_WEIGHTS,
)


def ref_q_mixture_sample(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Mixture-targeted corpus sample, summarized per source bucket.

    Counts + per-row md5-cutoff membership recomputed with plain
    Python/hashlib; the water-filling allocation is the SHARED pure
    function (turtle_spark.functions.mixture — Spark-free), so what
    this golden pins is the distributed side: the bounded count
    aggregate, the CASE-cutoff filter, and the summary aggregation."""
    import hashlib

    import pandas as pd

    from turtle_spark.functions.mixture import mixture_fractions

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = list(zip(d["doc_id"].tolist(), d["source"].tolist(), d["n_chars"].tolist()))
    counts: dict[str, int] = {}
    for _, src, _ in rows:
        if src in MIXTURE_WEIGHTS:
            counts[src] = counts.get(src, 0) + 1
    fracs = mixture_fractions(counts, MIXTURE_WEIGHTS, MIXTURE_BUDGET)

    def cutoff_hex(fraction: float) -> str:
        n = int(round(fraction * (1 << 32)))
        return "g" if n >= 1 << 32 else format(n, "08x")

    agg: dict[str, list] = {}
    for doc_id, src, n_chars in rows:
        frac = fracs.get(src)
        if frac is None:
            continue
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        if h < cutoff_hex(frac):
            a = agg.setdefault(src, [0, 0, 0])
            a[0] += 1
            a[1] ^= xxh64_str(str(doc_id)) & _U64
            a[2] += int(n_chars)
    out = [
        (src, n, fp - (1 << 64) if fp >= 1 << 63 else fp, chars)
        for src, (n, fp, chars) in sorted(agg.items())
    ]
    return ["source", "n_docs", "doc_fp", "sum_chars"], out


NOVELTY_THRESHOLD = 0.5
NOVELTY_CANDIDATE_CAP = 64


def ref_q_novelty_screen(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Incremental dedup of a batch (doc_id % 5 == 0) against the rest
    of the corpus as the pre-built index — plain dict/set loops vs the
    engine's hash joins + window caps."""
    import hashlib

    docs = _read_documents(sf_dir)
    corpus = [(d, t) for d, t in docs if d % 5 != 0]
    batch = [(d, t) for d, t in docs if d % 5 == 0]

    by_hash: dict[str, int] = {}
    for d, t in corpus:
        h = hashlib.sha256((t or "").encode()).hexdigest()
        by_hash[h] = min(by_hash.get(h, d), d)

    a, b = minhash_perm_coeffs(128, seed=7)
    buckets: dict[tuple[int, int], list[int]] = {}
    texts = {d: (t or "") for d, t in docs}
    for d, t in corpus:
        sig = minhash_sig(char_shingles(t or "", 5), a, b)
        for band_index, band_hash in enumerate(band_fold(sig, 32)):
            buckets.setdefault((band_index, band_hash), []).append(d)

    out = []
    for d, t in sorted(batch):
        h = hashlib.sha256((t or "").encode()).hexdigest()
        if h in by_hash:
            out.append((d, "exact", by_hash[h], None))
            continue
        sig = minhash_sig(char_shingles(t or "", 5), a, b)
        cands: set[int] = set()
        for band_index, band_hash in enumerate(band_fold(sig, 32)):
            cands.update(buckets.get((band_index, band_hash), ()))
        best = None
        for old in sorted(cands)[:NOVELTY_CANDIDATE_CAP]:
            jac = jaccard_shingles(t or "", texts[old], 5)
            if jac >= NOVELTY_THRESHOLD and (
                best is None or jac > best[1] or (jac == best[1] and old < best[0])
            ):
                best = (old, jac)
        if best is not None:
            out.append((d, "near", best[0], best[1]))
        else:
            out.append((d, "novel", None, None))
    return ["doc_id", "status", "matched_id", "jaccard"], out


def ref_q_triangle_count() -> tuple[list[str], list[tuple]]:
    """Per-node triangle counts — adjacency-set intersection loop (a
    DIFFERENT algorithm from the engine's degree-ordered wedge joins:
    no orientation, no join machinery)."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    nbrs: dict[str, set] = {}
    und = set()
    for r in rows:
        if r[7] == "iri" and r[2] != r[4]:
            a, b = min(r[2], r[4]), max(r[2], r[4])
            und.add((a, b))
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    tri: dict[str, int] = {}
    for a, b in sorted(und):
        for c in nbrs[a] & nbrs[b]:
            if c > b:  # each triangle once: a < b < c
                for n in (a, b, c):
                    tri[n] = tri.get(n, 0) + 1
    return ["node", "n_triangles"], sorted(tri.items())


def ref_q_cc_incremental() -> tuple[list[str], list[tuple]]:
    """Mirror of q_cc_incremental: re-derive the hash graph, compute
    BOTH the base and the full assignment with a plain union-find
    (min-id components), and express the delta as their difference —
    independent of the engine's contract-and-merge path."""
    n_nodes, n_draws = 500, 700
    edges = set()
    for i in range(n_draws):
        x = pmod(xxh64_str(f"{i}|a"), n_nodes)
        y = pmod(xxh64_str(f"{i}|b"), n_nodes)
        if x != y:
            edges.add((min(x, y), max(x, y)))
    base = {e for e in edges if pmod(xxh64_str(f"{e[0]}|{e[1]}"), 4) != 0}
    delta = edges - base

    def components(es: set) -> dict[int, int]:
        parent: dict[int, int] = {}

        def find(v: int) -> int:
            while parent.get(v, v) != v:
                parent[v] = parent.get(parent[v], parent[v])
                v = parent[v]
            return v

        for a, b in sorted(es):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in parent}

    a0 = components(base)
    full = components(edges)
    n_delta = sum(1 for n, c in full.items() if a0.get(n) != c)
    fp = 0
    for n, c in full.items():
        fp ^= xxh64_str(f"{n}:{c}") & 0xFFFFFFFFFFFFFFFF
    return ["n_assigned", "n_components", "n_delta_rows", "assign_fp"], [
        (len(full), len(set(full.values())), n_delta, _signed64(fp))
    ]


def ref_q_doc_lint() -> tuple[list[str], list[tuple]]:
    """Expected lint issues derived FROM THE GENERATION SPEC (i % 5
    defect classes), not by re-linting — the engine must detect
    exactly the defect each document was planted with."""
    expected = {
        0: [],
        1: ["unterminated-statement"],
        2: ["undeclared-prefix"],
        3: ["unclosed-group"],
        4: ["unclosed-literal", "unterminated-statement"],
    }
    out = []
    for i in range(50):
        iss = expected[i % 5]
        out.append((f"bad-{i:06d}", ",".join(iss), bool(iss)))
    return ["doc_id", "issues_csv", "quarantined"], out


def ref_q_text_normalize() -> tuple[list[str], list[tuple]]:
    """Mirror of operators/curation.normalize_text over the messy-doc
    spec (sources/corpus.messy_text): independent re-implementation of
    both the synthesis and the normalization chain."""
    import re
    import unicodedata

    def messy(i: int) -> str:
        base = (
            f"Doc {i}: cafe\u0301 nai\u0308ve re\u0301sume\u0301 "
            + "word " * (i % 5)
            + "end"
        )
        kind = i % 4
        if kind == 0:
            return base.replace(" ", " \u200b") + "\r\nsecond line"
        if kind == 1:
            return "\x07" + base.replace(" ", "  ") + "\x1b tail  "
        if kind == 2:
            return "\u202e" + base.replace(" ", "\t") + "\ufeff"
        return base

    zw = re.compile("[\u200b-\u200f\u202a-\u202e\u2060\ufeff]")
    ctrl = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
    ws = re.compile("[ \t]+")
    edge = re.compile(" ?\n ?")

    def norm(s: str) -> str:
        s = unicodedata.normalize("NFC", s)
        s = s.replace("\r\n", "\n").replace("\r", "\n")
        s = zw.sub("", s)
        s = ctrl.sub("", s)
        s = ws.sub(" ", s)
        s = edge.sub("\n", s)
        return s.strip()

    out = []
    for i in range(40):
        raw = messy(i)
        nt = norm(raw)
        out.append((i, nt, len(raw), len(nt), raw != nt))
    return ["doc_id", "norm_text", "n_raw_chars", "n_norm_chars", "changed"], out


def ref_q_clustering_coef() -> tuple[list[str], list[tuple]]:
    """Per-node local clustering coefficient — adjacency-set loop,
    no join machinery shared with the engine."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    nbrs: dict[str, set] = {}
    und = set()
    for r in rows:
        if r[7] == "iri" and r[2] != r[4]:
            a, b = min(r[2], r[4]), max(r[2], r[4])
            und.add((a, b))
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    tri: dict[str, int] = {}
    for a, b in sorted(und):
        for c in nbrs[a] & nbrs[b]:
            if c > b:
                for n in (a, b, c):
                    tri[n] = tri.get(n, 0) + 1
    out = []
    for node in sorted(nbrs):
        d = len(nbrs[node])
        if d < 2:
            continue
        t = tri.get(node, 0)
        out.append((node, d, t, spark_round(2 * t / (d * (d - 1)), 6)))
    return ["node", "deg", "n_triangles", "lcc"], out


def ref_q_kg_delta() -> tuple[list[str], list[tuple]]:
    """Per-predicate triple delta between two doc-hash snapshots —
    plain Python set difference vs the engine's anti-joins."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())

    def snap(excluded_residue: int) -> set:
        return {
            (r[2], r[3], r[4], r[5], r[6], r[7])
            for r in rows
            if pmod(xxh64_str(r[0] + "#snap"), 4) != excluded_residue
        }

    old, new = snap(0), snap(1)

    def per_pred(delta: set) -> dict:
        agg: dict[str, list] = {}
        for s, pr, o, label, dt, ot in delta:
            cnt_fp = agg.setdefault(pr, [0, 0])
            cnt_fp[0] += 1
            cnt_fp[1] ^= xxh64_str("|".join((s, o, label, dt, ot))) & _U64
        return agg

    added, removed = per_pred(new - old), per_pred(old - new)

    def signed(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    out = []
    for pred in sorted(set(added) | set(removed)):
        a = added.get(pred, [0, 0])
        r = removed.get(pred, [0, 0])
        out.append((pred, a[0], r[0], signed(a[1]), signed(r[1])))
    return ["predicate", "n_added", "n_removed", "added_fp", "removed_fp"], out


def ref_q_entity_cards() -> tuple[list[str], list[tuple]]:
    """Per-entity summary cards (bag semantics over the triple stream)
    for a 1-in-10 hash sample of IRI subjects — dict aggregation vs
    the engine's groupBy."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    cards: dict[str, list] = {}
    for r in rows:
        subj = r[2]
        if subj.startswith("_:"):
            continue
        c = cards.setdefault(subj, [0, set(), 0, 0, 0])
        c[0] += 1
        c[1].add(r[3])
        if r[7] == "literal":
            c[2] += 1
        if r[7] == "iri" and not r[4].startswith("_:"):
            c[3] += 1
        c[4] ^= xxh64_str(r[3] + "|" + r[4]) & _U64

    def signed(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    out = [
        (subj, c[0], len(c[1]), c[2], c[3], signed(c[4]))
        for subj, c in sorted(cards.items())
        if pmod(xxh64_str(subj + "#card"), 10) == 0
    ]
    return (
        ["subject", "n_triples", "n_predicates", "n_literals", "n_links", "card_fp"],
        out,
    )


_FOAF_KNOWS = "http://xmlns.com/foaf/0.1/knows"
_REL_ENEMY = "http://www.perceive.net/schemas/relationship/enemyOf"
_RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
_RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def ref_q_path_social() -> tuple[list[str], list[tuple]]:
    """SPARQL path ``(foaf:knows|rel:enemyOf)+`` — per-source BFS over
    the union adjacency (an independent algorithm from the engine's
    alternation-union + path-doubling closure), summarized per src as
    (n_reachable, XOR of xxhash64(dst))."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    adj: dict[str, set] = {}
    for r in rows:
        if r[3] in (_FOAF_KNOWS, _REL_ENEMY):
            adj.setdefault(r[2], set()).add(r[4])
    out = []
    for src in sorted(adj):
        seen: set[str] = set()
        stack = [src]
        while stack:
            for v in adj.get(stack.pop(), ()):
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        fp = 0
        for d in seen:
            fp ^= xxh64_str(d) & _U64
        out.append((src, len(seen), _signed64(fp)))
    return ["src", "n_reachable", "dst_fp"], out


def ref_q_path_members() -> tuple[list[str], list[tuple]]:
    """SPARQL path ``rdf:rest*/rdf:first`` (canonical collection
    membership) — zero-length identity over every graph term, BFS
    down the rest spine, union of first-values; vs the engine's
    star-closure + equi-join."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    radj: dict[str, set] = {}
    fmap: dict[str, set] = {}
    terms: set[str] = set()
    for r in rows:
        terms.add(r[2])
        terms.add(r[4])
        if r[3] == _RDF_REST:
            radj.setdefault(r[2], set()).add(r[4])
        elif r[3] == _RDF_FIRST:
            fmap.setdefault(r[2], set()).add(r[4])
    out = []
    for u in sorted(terms):
        reach = {u}
        stack = [u]
        while stack:
            for v in radj.get(stack.pop(), ()):
                if v not in reach:
                    reach.add(v)
                    stack.append(v)
        members: set[str] = set()
        for v in reach:
            members |= fmap.get(v, set())
        if members:
            fp = 0
            for m in members:
                fp ^= xxh64_str(m) & _U64
            out.append((u, len(members), _signed64(fp)))
    return ["src", "n_members", "member_fp"], out


def ref_q_rdfs_entail() -> tuple[list[str], list[tuple]]:
    """RDFS entailment delta under the local-name alignment schema —
    dict/set rule application (rdfs5/7/9/11) vs the engine's broadcast
    joins + path-doubling closures, summarized per entailed predicate."""
    import re

    rdf_ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rdf_type = rdf_ns + "type"
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())

    def local(term: str) -> str:
        m = re.search(r"([^/#]+)$", term)
        return m.group(1) if m else ""

    def align(terms: set) -> dict:
        groups: dict[str, list] = {}
        for t in terms:
            groups.setdefault(local(t), []).append(t)
        out = {}
        for ms in groups.values():
            canon = min(ms)
            for m in ms:
                if m != canon:
                    out[m] = canon
        return out

    classes = {r[4] for r in rows if r[3] == rdf_type and r[7] == "iri"}
    preds = {r[3] for r in rows if not r[3].startswith(rdf_ns)}
    sub_prop, sub_cls = align(preds), align(classes)

    base = {(r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows}
    # rdfs7 (alignment hierarchies are depth 1, so closure == input)
    ext = {
        (s, sub_prop[p], o, lb, dt, ot)
        for (s, p, o, lb, dt, ot) in base
        if p in sub_prop
    }
    # rdfs9 over asserted + rdfs7-derived type statements
    types = {
        (s, o)
        for (s, p, o, lb, dt, ot) in base | ext
        if p == rdf_type and ot == "iri"
    }
    types |= {(s, sub_cls[c]) for (s, c) in types if c in sub_cls}
    type_triples = {(s, rdf_type, c, "", "", "iri") for (s, c) in types}
    delta = (ext | type_triples) - base

    summary: dict[str, list] = {}
    for s, p, o, lb, dt, ot in delta:
        acc = summary.setdefault(p, [0, 0])
        acc[0] += 1
        acc[1] ^= xxh64_str(s + "|" + o) & _U64
    out = [(p, n, _signed64(fp)) for p, (n, fp) in sorted(summary.items())]
    return ["predicate", "n_entailed", "pair_fp"], out


def ref_q_kcore() -> tuple[list[str], list[tuple]]:
    """2-core of the entity graph — ONE-node-at-a-time sequential
    peeling (the k-core fixpoint is unique, so any removal order
    agrees with the engine's all-at-once sweeps)."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    adj: dict[str, set] = {}
    for r in rows:
        if r[7] == "iri" and r[2] != r[4]:
            a, b = min(r[2], r[4]), max(r[2], r[4])
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in sorted(adj):
            if len(adj[n]) < 2:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
                break
    out = [(n, len(ns)) for n, ns in sorted(adj.items())]
    return ["node", "degree"], out


def ref_q_sparql_optional() -> tuple[list[str], list[tuple]]:
    """SPARQL OPTIONAL + FILTER — hand-evaluated bag left join: each
    name binding pairs with every mbox of its subject, or with one
    None row when the subject has no mbox; the filter keeps rows
    where mbox is bound OR the name has >= 4 characters."""
    from collections import Counter

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    foaf = "http://xmlns.com/foaf/0.1/"
    names = [(r[2], r[4]) for r in rows if r[3] == foaf + "name"]
    mboxes: dict[str, list] = {}
    for r in rows:
        if r[3] == foaf + "mbox":
            mboxes.setdefault(r[2], []).append(r[4])
    out: Counter = Counter()
    for s, name in names:
        for m in mboxes.get(s) or [None]:
            if m is not None or len(name) >= 4:
                out[(s, name, m)] += 1
    res = [
        (s, name, m, n)
        for (s, name, m), n in sorted(
            out.items(), key=lambda kv: (kv[0][0], kv[0][1], kv[0][2] or "")
        )
    ]
    return ["s", "name", "mbox", "n_bindings"], res


def ref_q_sparql_agg() -> tuple[list[str], list[tuple]]:
    """SPARQL GROUP BY — class census with an http-prefix filter."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    stats: dict[str, tuple[int, set]] = {}
    for r in rows:
        if r[3] == _RDF_TYPE and r[4].startswith("http"):
            n, subs = stats.setdefault(r[4], (0, set()))
            stats[r[4]] = (n + 1, subs)
            subs.add(r[2])
    out = [(t, n, len(subs)) for t, (n, subs) in sorted(stats.items())]
    return ["t", "n_rows", "n_subjects"], out


def ref_q_sparql_having() -> tuple[list[str], list[tuple]]:
    """SPARQL SUM/AVG/SAMPLE + HAVING — per-predicate numeric census
    over literal objects.  Mirrors the engine's documented numeric
    semantics exactly: the lexical form is cast to DECIMAL(38,10) with
    HALF_UP rounding (Spark's ANSI string->decimal rule); forms that
    do not cast (words, booleans, Infinity/NaN) are dropped; SUM is
    the exact decimal sum rendered as DOUBLE; AVG is one double
    division by the count of values that cast; SAMPLE is MIN.  HAVING
    keeps predicates with >= 10 literal bindings."""
    from decimal import ROUND_HALF_UP, Decimal, InvalidOperation

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    groups: dict[str, list[str]] = {}
    for r in rows:
        if r[7] == "literal":
            groups.setdefault(r[3], []).append(r[4])
    q = Decimal("1E-10")
    out: list[tuple] = []
    for p in sorted(groups):
        vals = groups[p]
        if len(vals) < 10:
            continue
        nums = []
        for v in vals:
            try:
                d = Decimal(v)
            except InvalidOperation:
                continue
            if not d.is_finite():
                continue
            nums.append(d.quantize(q, rounding=ROUND_HALF_UP))
        # + 0.0 normalizes IEEE -0.0 (a sum of only -0E-10 terms) to
        # the 0.0 Spark's decimal (signless zero) produces
        total = float(sum(nums)) + 0.0 if nums else None
        mean = (float(sum(nums)) + 0.0) / len(nums) if nums else None
        out.append((p, len(vals), total, mean, min(vals)))
    return ["p", "n_lit", "total", "mean_val", "lex_min"], out


def ref_q_sparql_bind() -> tuple[list[str], list[tuple]]:
    """SPARQL BIND + expression functions — literal-length census by
    derived local name and size bucket.  Mirrors the engine's
    documented expression semantics independently: STRAFTER = text
    after the FIRST separator occurrence ('' if absent), STRLEN =
    codepoint count, IF nesting for the bucket, score = len*3+1
    summed exactly (integers), FILTER drops rows whose predicate
    lacks the separator."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    groups: dict[tuple[str, str], list[int]] = {}
    for r in rows:
        if r[7] != "literal":
            continue
        p, v = r[3], r[4]
        idx = p.find("1.0/")
        local = p[idx + 4:] if idx >= 0 else ""
        if local == "":
            continue
        vlen = len(v)
        bucket = "long" if vlen >= 12 else ("mid" if vlen >= 4 else "short")
        groups.setdefault((local, bucket), []).append(vlen * 3 + 1)
    out = [
        (local, bucket, len(scores), float(sum(scores)))
        for (local, bucket), scores in sorted(groups.items())
    ]
    return ["local", "bucket", "n_lit", "total_score"], out


def ref_q_sparql_union() -> tuple[list[str], list[tuple]]:
    """SPARQL UNION + VALUES — two link vocabularies with different
    variable sets; the knows branch is VALUES-restricted, the enemyOf
    branch bag-joins each link with every name of its source."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    foaf = "http://xmlns.com/foaf/0.1/"
    allowed = {
        "http://example.org/#spiderman",
        "http://example.org/#green-goblin",
        "http://example.org/nobody-links-me",
    }
    union_rows: list[tuple] = []
    for r in rows:
        if r[3] == _FOAF_KNOWS and r[7] == "iri" and r[2] in allowed:
            union_rows.append((r[2], r[4], None))
    names: dict[str, list] = {}
    for r in rows:
        if r[3] == foaf + "name":
            names.setdefault(r[2], []).append(r[4])
    for r in rows:
        if r[3] == _REL_ENEMY and r[7] == "iri":
            for nm in names.get(r[2], []):
                union_rows.append((r[2], r[4], nm))
    per_a: dict[str, list] = {}
    for a, b, nm in union_rows:
        per_a.setdefault(a, []).append((b, nm))
    out = []
    for a in sorted(per_a):
        links = per_a[a]
        fp = 0
        for b, _nm in links:
            fp ^= xxh64_str(b) & _U64
        out.append(
            (
                a,
                len(links),
                len({b for b, _ in links}),
                sum(1 for _, nm in links if nm is not None),
                _signed64(fp),
            )
        )
    return ["a", "n_links", "n_distinct", "n_named", "b_fp"], out


def ref_q_sparql_minus() -> tuple[list[str], list[tuple]]:
    """SPARQL MINUS + FILTER EXISTS — hand-evaluated set negation:
    the no_enemy branch keeps name bindings whose subject has no
    rel:enemyOf edge (MINUS on the shared ?s), the knows branch
    keeps those whose subject has at least one foaf:knows edge
    (EXISTS keeps each binding once, whatever the match count).
    Counts are bag multiplicities of the surviving name bindings;
    a subject in neither branch does not appear at all."""
    from collections import Counter

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    foaf_name = "http://xmlns.com/foaf/0.1/name"
    names = [(r[2], r[4]) for r in rows if r[3] == foaf_name]
    enemies = {r[2] for r in rows if r[3] == _REL_ENEMY}
    knows = {r[2] for r in rows if r[3] == _FOAF_KNOWS}
    c_no_enemy = Counter(sn for sn in names if sn[0] not in enemies)
    c_knows = Counter(sn for sn in names if sn[0] in knows)
    out = [
        (s, name, c_no_enemy.get((s, name), 0), c_knows.get((s, name), 0))
        for s, name in sorted(set(c_no_enemy) | set(c_knows))
    ]
    return ["s", "name", "n_no_enemy", "n_knows"], out


def ref_q_sparql_topk() -> tuple[list[str], list[tuple]]:
    """SPARQL subselect + solution modifiers — hand evaluation: rank
    subjects by knows-out-degree (bag count) descending with subject
    ascending as the total-order tie-break, take ranks 2-4 (OFFSET 1
    LIMIT 3), then inner-join back to every knows-edge occurrence of
    those subjects (bag semantics: duplicate asserted triples yield
    duplicate solutions)."""
    from collections import Counter

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    knows = [(r[2], r[4]) for r in rows if r[3] == _FOAF_KNOWS]
    deg = Counter(s for s, _ in knows)
    ranked = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[1:4]
    top = dict(ranked)
    out = sorted((s, o, top[s]) for s, o in knows if s in top)
    return ["s", "o", "deg"], out


def ref_q_line_dedup() -> tuple[list[str], list[tuple]]:
    """Line-level boilerplate dedup — hand evaluation with a Counter:
    a space-trimmed non-empty line appearing in >= 5 distinct docs is
    boilerplate; every occurrence is removed, remaining lines keep
    their order; per-doc counts plus md5 of the reassembled text."""
    import hashlib
    from collections import Counter

    docs = [(d, _assemble(s)) for d, s in _corpus_docs(200) + _fixture_docs()]
    seen: Counter = Counter()
    for _d, text in docs:
        seen.update({ln.strip(" ") for ln in text.split("\n") if ln.strip(" ")})
    boiler = {k for k, n in seen.items() if n >= 5}
    out = []
    for d, text in docs:
        lines = text.split("\n")
        kept = [ln for ln in lines if ln.strip(" ") not in boiler]
        clean = "\n".join(kept)
        out.append(
            (
                d,
                len(lines),
                len(lines) - len(kept),
                len(clean),
                hashlib.md5(clean.encode("utf-8")).hexdigest(),
            )
        )
    return ["doc_id", "n_lines", "n_removed", "clean_len", "clean_md5"], sorted(out)


def ref_q_char_sets() -> tuple[list[str], list[tuple]]:
    """Characteristic sets (Neumann & Moerkotte) — hand evaluation
    over the SET view of the graph: per subject the sorted distinct
    predicate set; per set the subject count and total distinct
    triples; sets with a single subject are pruned (min support 2,
    the planner's usual cut)."""
    from collections import Counter

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    trip = {(r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows}
    preds: dict[str, set] = {}
    ntrip: Counter = Counter()
    for t in trip:
        preds.setdefault(t[0], set()).add(t[1])
        ntrip[t[0]] += 1
    subs: dict[tuple, list] = {}
    for s, ps in preds.items():
        subs.setdefault(tuple(sorted(ps)), []).append(s)
    out = [
        (" ".join(ps), len(ps), len(ss), sum(ntrip[s] for s in ss))
        for ps, ss in subs.items()
        if len(ss) >= 2
    ]
    out.sort(key=lambda r: (-r[2], r[0]))
    return ["cs", "n_preds", "n_subjects", "n_triples"], out


def ref_q_kg_walks() -> tuple[list[str], list[tuple]]:
    """Deterministic random walks — sequential dict-adjacency walker.
    Same hash-choice rule as the engine (next = sorted-neighbors[
    xxh64(walk_id|step|node) mod deg]) but a plain Python loop, no
    DataFrames: what the comparison pins is the engine's indexed-edge
    join mechanics, start sampling, and union/agg semantics."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    directed = set()
    for r in rows:
        if r[7] == "iri" and r[2] != r[4]:
            directed.add((r[2], r[4]))
    adj: dict[str, list] = {}
    for a, b in directed | {(b, a) for a, b in directed}:
        adj.setdefault(a, set()).add(b)
    nbrs = {n: sorted(v) for n, v in adj.items()}
    starts = sorted(
        n for n in nbrs if pmod(xxh64_str(n + "#walkstart"), 40) == 0
    )
    per_start: dict[str, tuple[int, set, int]] = {}
    for start in starts:
        visits, distinct, fp = 0, set(), 0
        for k in range(2):
            walk_id = f"{start}#w{k}"
            node = start
            for pos in range(8):
                if pos > 0:
                    ns = nbrs[node]
                    node = ns[pmod(xxh64_str(f"{walk_id}|{pos}|{node}"), len(ns))]
                visits += 1
                distinct.add(node)
                fp ^= xxh64_str(f"{walk_id}|{pos}|{node}") & _U64
        per_start[start] = (visits, distinct, fp)
    out = [
        (s, v, len(d), _signed64(fp)) for s, (v, d, fp) in sorted(per_start.items())
    ]
    return ["start", "n_visits", "n_distinct_nodes", "walk_fp"], out


def ref_q_shacl_report() -> tuple[list[str], list[tuple]]:
    """SHACL-lite validation — hand-evaluated per-focus loop over the
    SET view of the graph (reference semantics: graph dedups on
    insert).  Constraint kinds: minCount/maxCount over distinct value
    nodes, nodeKind, plain-literal datatype, unanchored pattern
    search, and sh:class membership."""
    import re as _re

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    graph = {(r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows}
    typed = {
        (t[0], t[2]) for t in graph if t[1] == _RDF_TYPE
    }
    foaf = "http://xmlns.com/foaf/0.1/"
    rel = "http://www.perceive.net/schemas/relationship/"
    # (shape_id, target, pred, min, max, kind, req_dt, obj_cls, pattern)
    shapes = [
        ("person-name-min", foaf + "Person", foaf + "name", 1, None, None, None, None, None),
        ("person-name-max3", foaf + "Person", foaf + "name", None, 3, None, None, None, None),
        ("person-mbox-min", foaf + "Person", foaf + "mbox", 1, None, None, None, None, None),
        ("person-name-plain", foaf + "Person", foaf + "name", None, None, None, "", None, None),
        ("person-name-latin", foaf + "Person", foaf + "name", None, None, None, None, None, "^[A-Za-z]"),
        ("person-enemy-person", foaf + "Person", rel + "enemyOf", None, None, "iri", None, foaf + "Person", None),
    ]
    viols: list[tuple] = []  # (shape_id, constraint, focus, value|None)
    for sid, target, pred, mn, mx, kind, req_dt, obj_cls, pat in shapes:
        for focus in sorted({n for n, c in typed if c == target}):
            vals = [t for t in graph if t[0] == focus and t[1] == pred]
            if mn is not None and len(vals) < mn:
                viols.append((sid, "minCount", focus, None))
            if mx is not None and len(vals) > mx:
                viols.append((sid, "maxCount", focus, None))
            for t in vals:
                o, label, dt, ot = t[2], t[3], t[4], t[5]
                if kind is not None and ot != kind:
                    viols.append((sid, "nodeKind", focus, o))
                if req_dt is not None and ot == "literal":
                    bad = (dt != "" or label != "") if req_dt == "" else dt != req_dt
                    if bad:
                        viols.append((sid, "datatype", focus, o))
                if pat is not None and not _re.search(pat, o):
                    viols.append((sid, "pattern", focus, o))
                if obj_cls is not None and (o, obj_cls) not in typed:
                    viols.append((sid, "class", focus, o))
    agg: dict[tuple, tuple[int, int]] = {}
    for sid, con, focus, value in viols:
        n, fp = agg.setdefault((sid, con), (0, 0))
        agg[(sid, con)] = (n + 1, fp ^ (xxh64_str(f"{focus}|{value or ''}") & _U64))
    out = [
        (sid, con, n, _signed64(fp))
        for (sid, con), (n, fp) in sorted(agg.items())
    ]
    return ["shape_id", "constraint", "n_violations", "viol_fp"], out


def ref_q_kg_verbalize() -> tuple[list[str], list[tuple]]:
    """KG verbalization — hand-assembled sentences over the set view:
    local name = last /-or-# segment with '_' -> ' ', IRI objects as
    local names, literals double-quoted, facts sorted by (predicate,
    object, objecttype) capped at 12, ASCII-whitespace token count."""
    import re as _re

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    facts: dict[str, set] = {}
    for r in rows:
        facts.setdefault(r[2], set()).add((r[3], r[4], r[7]))

    def local(iri: str) -> str:
        return _re.split(r"[/#]", iri)[-1].replace("_", " ")

    out = []
    for subj in sorted(facts):
        if pmod(xxh64_str(subj + "#verb"), 50) != 0:
            continue
        fs = sorted(facts[subj])
        kept = fs[:12]
        parts = []
        for p, o, ot in kept:
            obj = local(o) if ot == "iri" else f'"{o}"'
            parts.append(f"{local(subj)} {local(p)} {obj}.")
        text = " ".join(parts)
        n_tokens = len(_re.split(r"[ \t\n\r]+", text))
        out.append((subj, len(kept), len(fs), n_tokens, text))
    return ["subject", "n_facts", "n_total_facts", "n_tokens", "text"], out


def ref_q_kg_communities() -> tuple[list[str], list[tuple]]:
    """Synchronous label propagation — plain dict loops: 4 rounds,
    every node simultaneously adopts its neighbors' most frequent
    previous-round label, ties to the smallest label."""
    from collections import Counter

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    directed = {
        (r[2], r[4]) for r in rows if r[7] == "iri" and r[2] != r[4]
    }
    adj: dict[str, set] = {}
    for a, b in directed | {(b, a) for a, b in directed}:
        adj.setdefault(a, set()).add(b)
    labels = {n: n for n in adj}
    for _ in range(4):
        new = {}
        for n, ns in adj.items():
            c = Counter(labels[m] for m in ns)
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best
        labels = new
    comm: dict[str, list] = {}
    for n, lb in labels.items():
        comm.setdefault(lb, []).append(n)
    out = []
    for lb in sorted(comm):
        members = comm[lb]
        if len(members) < 2:
            continue
        fp = 0
        for m in members:
            fp ^= xxh64_str(m) & _U64
        out.append((lb, len(members), _signed64(fp)))
    return ["label", "n_members", "member_fp"], out


def ref_q_sparql_construct() -> tuple[list[str], list[tuple]]:
    """SPARQL CONSTRUCT — hand-instantiated template over enemyOf
    pairs, set semantics, grouped per (predicate, objecttype)."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    rdf_type = _RDF_TYPE
    ex = "http://example.org/derived#"
    pairs = {(r[2], r[4]) for r in rows if r[3] == _REL_ENEMY and r[7] == "iri"}
    graph: set = set()
    for a, b in pairs:
        graph.add((b, _REL_ENEMY, a, "iri"))
        graph.add((a, rdf_type, ex + "Adversary", "iri"))
        graph.add((b, rdf_type, ex + "Adversary", "iri"))
        graph.add((a, ex + "status", "hostile", "literal"))
    agg: dict[tuple, tuple[int, int]] = {}
    for s, p, o, ot in graph:
        n, fp = agg.setdefault((p, ot), (0, 0))
        agg[(p, ot)] = (n + 1, fp ^ (xxh64_str(f"{s}|{o}") & _U64))
    out = [
        (p, ot, n, _signed64(fp)) for (p, ot), (n, fp) in sorted(agg.items())
    ]
    return ["predicate", "objecttype", "n_triples", "pair_fp"], out


def ref_q_ntriples_export() -> tuple[list[str], list[tuple]]:
    """N-Triples writer — hand-built lines: escape chain in the same
    order (backslash first), md5-hex blank-label rename, lang before
    datatype, grouped by the predicate token."""
    import hashlib

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())

    def esc(s: str) -> str:
        return (
            s.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )

    def node(s: str) -> str:
        if s.startswith("_:"):
            return "_:b" + hashlib.md5(s.encode("utf-8")).hexdigest()
        return f"<{s}>"

    agg: dict[str, tuple[int, int, int]] = {}
    for r in rows:
        s, p, o, label, dt, ot = r[2], r[3], r[4], r[5], r[6], r[7]
        if ot == "literal":
            obj = f'"{esc(o)}"'
            if label:
                obj += f"@{label}"
            elif dt:
                obj += f"^^<{dt}>"
        else:
            obj = node(o)
        line = f"{node(s)} <{p}> {obj} ."
        tok = f"<{p}>"
        n, b, fp = agg.setdefault(tok, (0, 0, 0))
        agg[tok] = (
            n + 1,
            b + len(line.encode("utf-8")),
            fp ^ (xxh64_str(line) & _U64),
        )
    out = [
        (tok, n, b, _signed64(fp)) for tok, (n, b, fp) in sorted(agg.items())
    ]
    return ["pred_token", "n_lines", "total_bytes", "line_fp"], out


def ref_q_nquads_export() -> tuple[list[str], list[tuple]]:
    """N-Quads writer — the NT line plus the graph term
    ``<urn:graph:doc_id>`` before the dot; same escape chain, blank
    rename, grouping, and XOR fingerprint as ref_q_ntriples_export."""
    import hashlib

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())

    def esc(s: str) -> str:
        return (
            s.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )

    def node(s: str) -> str:
        if s.startswith("_:"):
            return "_:b" + hashlib.md5(s.encode("utf-8")).hexdigest()
        return f"<{s}>"

    agg: dict[str, tuple[int, int, int]] = {}
    for r in rows:
        doc, s, p, o, label, dt, ot = r[0], r[2], r[3], r[4], r[5], r[6], r[7]
        if ot == "literal":
            obj = f'"{esc(o)}"'
            if label:
                obj += f"@{label}"
            elif dt:
                obj += f"^^<{dt}>"
        else:
            obj = node(o)
        line = f"{node(s)} <{p}> {obj} <urn:graph:{doc}> ."
        tok = f"<{p}>"
        n, b, fp = agg.setdefault(tok, (0, 0, 0))
        agg[tok] = (
            n + 1,
            b + len(line.encode("utf-8")),
            fp ^ (xxh64_str(line) & _U64),
        )
    out = [
        (tok, n, b, _signed64(fp)) for tok, (n, b, fp) in sorted(agg.items())
    ]
    return ["pred_token", "n_lines", "total_bytes", "line_fp"], out


def ref_q_sparql_graph() -> tuple[list[str], list[tuple]]:
    """SPARQL GRAPH ?g — per-document co-assertion join, evaluated
    per doc by construction (one graph per doc): typed pairs (s, t)
    bag-joined with IRI links (s, p, o) of the SAME doc, p != rdf:type;
    outputs (graph, n_links, n_subjects, n_types)."""
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    by_doc: dict[str, list[tuple]] = {}
    for r in rows:
        by_doc.setdefault(r[0], []).append(r)
    out: list[tuple] = []
    for doc in sorted(by_doc):
        typed = [
            (r[2], r[4]) for r in by_doc[doc]
            if r[3] == rdf_type and r[7] == "iri"
        ]
        links = [
            (r[2], r[3], r[4]) for r in by_doc[doc]
            if r[7] == "iri" and r[3] != rdf_type
        ]
        n_links = 0
        subs: set[str] = set()
        types: set[str] = set()
        for s, t in typed:
            for ls, _p, _o in links:
                if ls == s:
                    n_links += 1
                    subs.add(s)
                    types.add(t)
        if n_links:
            out.append((f"urn:graph:{doc}", n_links, len(subs), len(types)))
    return ["g", "n_links", "n_subjects", "n_types"], out


def ref_q_containers() -> tuple[list[str], list[tuple]]:
    """RDF container recovery — entity edges (distinct iri links,
    self-loops dropped), members ranked per head by (xxhash64, dst),
    heads with >= 2 members; fingerprint = xxh64 of the '|'-joined
    ordered items.  Mirrors _q_containers' deterministic synthesis +
    graph.container_arrays recovery."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    by_src: dict[str, set[str]] = {}
    for r in rows:
        if r[7] != "iri":
            continue
        if r[2] != r[4]:
            by_src.setdefault(r[2], set()).add(r[4])
        if r[3] == rdf_type:
            by_src.setdefault("urn:seq:" + r[4], set()).add(r[2])
    out: list[tuple] = []
    for head in sorted(by_src):
        dsts = sorted(by_src[head], key=lambda d: (xxh64_str(d), d))
        if len(dsts) < 2:
            continue
        out.append(
            (
                head,
                len(dsts),
                xxh64_str("|".join(dsts)),
                dsts[0],
                dsts[-1],
            )
        )
    return ["head", "n_items", "items_fp", "first_item", "last_item"], out


def ref_q_collections() -> tuple[list[str], list[tuple]]:
    """Ordered collection recovery — global first/rest maps (blank
    cells are doc-globalized by _extract_all, so no cross-doc
    collision), heads = cells no rest edge targets, sequential walk
    per head; fingerprint = xxh64 of the '|'-joined ordered items."""
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    first: dict[str, str] = {}
    rest: dict[str, str] = {}
    rest_targets: set[str] = set()
    for r in rows:
        if r[3] == rdf + "first":
            first[r[2]] = r[4]
        elif r[3] == rdf + "rest" and r[7] == "iri" and r[4] != rdf + "nil":
            rest[r[2]] = r[4]
            rest_targets.add(r[4])
    out: list[tuple] = []
    for head in sorted(first):
        if head in rest_targets:
            continue
        items: list[str] = []
        cell: str | None = head
        while cell is not None and cell in first:
            items.append(first[cell])
            cell = rest.get(cell)
        out.append(
            (
                head,
                len(items),
                xxh64_str("|".join(items)),
                items[0],
                items[-1],
            )
        )
    return ["head", "n_items", "items_fp", "first_item", "last_item"], out


def ref_q_triple_provenance() -> tuple[list[str], list[tuple]]:
    """Fact-support provenance — dict of fact -> (doc set, mention
    count), multi-source facts only, blank endpoints excluded."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    support: dict[tuple, tuple[set, int]] = {}
    for r in rows:
        if r[2].startswith("_:") or (r[7] == "iri" and r[4].startswith("_:")):
            continue
        key = (r[2], r[3], r[4])
        docs, n = support.setdefault(key, (set(), 0))
        docs.add(r[0])
        support[key] = (docs, n + 1)
    out = []
    for (s, p, o), (docs, n) in sorted(support.items()):
        if len(docs) < 2:
            continue
        fp = 0
        for d in docs:
            fp ^= xxh64_str(d) & _U64
        out.append((s, p, o, len(docs), n, _signed64(fp)))
    return ["subject", "predicate", "object", "n_docs", "n_mentions", "doc_fp"], out


def ref_q_schema_graph() -> tuple[list[str], list[tuple]]:
    """Schema induction — distinct types x distinct links, TOTAL over
    the instance graph (untyped endpoints -> '(untyped)'), class-pair
    aggregation with an XOR fingerprint over endpoint pairs,
    hash-sampled at 1/8 per class-pair."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    types: dict[str, set] = {}
    for r in rows:
        if r[3] == _RDF_TYPE:
            types.setdefault(r[2], set()).add(r[4])
    links = {
        (r[2], r[3], r[4])
        for r in rows
        if r[7] == "iri" and r[3] != _RDF_TYPE
    }
    agg: dict[tuple, tuple[int, int]] = {}
    for s, p, o in links:
        for sc in types.get(s) or {"(untyped)"}:
            for oc in types.get(o) or {"(untyped)"}:
                if pmod(xxh64_str(f"{sc}|{p}|{oc}"), 8) != 0:
                    continue
                n, fp = agg.setdefault((sc, p, oc), (0, 0))
                agg[(sc, p, oc)] = (
                    n + 1,
                    fp ^ (xxh64_str(f"{s}|{o}") & _U64),
                )
    out = [
        (sc, p, oc, n, _signed64(fp))
        for (sc, p, oc), (n, fp) in sorted(agg.items())
    ]
    return ["s_cls", "predicate", "o_cls", "n_links", "link_fp"], out


def ref_q_bfs_levels() -> tuple[list[str], list[tuple]]:
    """BFS levels — queue-based sequential BFS from 1/200 hash-sampled
    seeds over the undirected entity adjacency."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    directed = {
        (r[2], r[4]) for r in rows if r[7] == "iri" and r[2] != r[4]
    }
    adj: dict[str, set] = {}
    for a, b in directed | {(b, a) for a, b in directed}:
        adj.setdefault(a, set()).add(b)
    seeds = sorted(
        n for n in adj if pmod(xxh64_str(n + "#bfs"), 200) == 0
    )
    level = {s: 0 for s in seeds}
    frontier = list(seeds)
    for depth in range(1, 5):
        nxt = []
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in level:
                    level[m] = depth
                    nxt.append(m)
        if not nxt:
            break
        frontier = nxt
    per: dict[int, tuple[int, int]] = {}
    for n, lv in level.items():
        c, fp = per.setdefault(lv, (0, 0))
        per[lv] = (c + 1, fp ^ (xxh64_str(n) & _U64))
    out = [(lv, c, _signed64(fp)) for lv, (c, fp) in sorted(per.items())]
    return ["level", "n_nodes", "node_fp"], out


def ref_q_path_nps() -> tuple[list[str], list[tuple]]:
    """knows/!(name|rdf:type) — nested dict loops with set semantics
    at each step (distinct knows pairs, distinct non-name/type edges,
    distinct composed pairs)."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    knows = {
        (r[2], r[4])
        for r in rows
        if r[3] == "http://xmlns.com/foaf/0.1/knows"
    }
    banned = {"http://xmlns.com/foaf/0.1/name", _RDF_TYPE}
    step2: dict[str, set] = {}
    for r in rows:
        if r[3] not in banned:
            step2.setdefault(r[2], set()).add(r[4])
    pairs = {
        (a, o) for a, b in knows for o in step2.get(b, ())
    }
    per: dict[str, tuple[int, int]] = {}
    for a, o in sorted(pairs):
        n, fp = per.setdefault(a, (0, 0))
        per[a] = (n + 1, fp ^ (xxh64_str(o) & _U64))
    out = [(a, n, _signed64(fp)) for a, (n, fp) in sorted(per.items())]
    return ["src", "n_pairs", "dst_fp"], out


def ref_q_describe() -> tuple[list[str], list[tuple]]:
    """DESCRIBE — recursive set walk: seed triples plus transitive
    blank-object expansion (depth-capped at 4 like the engine),
    grouped per description subject."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    graph = {(r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows}
    by_subj: dict[str, set] = {}
    for t in graph:
        by_subj.setdefault(t[0], set()).add(t)
    seeds = sorted(
        s
        for s in by_subj
        if not s.startswith("_:")
        and pmod(xxh64_str(s + "#describe"), 100) == 0
    )
    desc: set = set()
    frontier = set(seeds)
    for _ in range(5):  # seed level + 4 blank levels
        level = set()
        for s in frontier:
            level |= by_subj.get(s, set())
        desc |= level
        frontier = {
            t[2]
            for t in level
            if t[5] == "iri" and t[2].startswith("_:")
        }
        if not frontier:
            break
    per: dict[str, tuple[int, int]] = {}
    for t in desc:
        n, fp = per.setdefault(t[0], (0, 0))
        per[t[0]] = (
            n + 1,
            fp
            ^ (xxh64_str("|".join((t[1], t[2], t[3], t[4], t[5]))) & _U64),
        )
    out = [(s, n, _signed64(fp)) for s, (n, fp) in sorted(per.items())]
    return ["subject", "n_triples", "desc_fp"], out


def ref_q_sameas_canonical() -> tuple[list[str], list[tuple]]:
    """Alias-stem owl:sameAs closure + canonical triple rewrite —
    stem groups via a dict, rewrite via plain loops, SET semantics via
    a Python set; vs the engine's groupBy-star-edges -> CC ->
    collision-guarded map joins -> dropDuplicates."""
    import re

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    entities = set()
    for r in rows:
        if not r[2].startswith("_:"):
            entities.add(r[2])
        if r[7] == "iri" and not r[4].startswith("_:"):
            entities.add(r[4])
    groups: dict[str, list[str]] = {}
    for e in entities:
        stem = re.sub(r"_?[0-9]+$", "", e)
        if stem and stem[-1] not in "/:#":
            groups.setdefault(stem, []).append(e)
    cmap: dict[str, str] = {}
    for members in groups.values():
        if len(members) < 2:
            continue
        canon = min(members)
        for e in members:
            if e != canon:
                cmap[e] = canon
    triple_set = set()
    for r in rows:
        s = cmap.get(r[2], r[2])
        o = cmap.get(r[4], r[4]) if r[7] == "iri" else r[4]
        triple_set.add((s, r[3], o, r[5], r[6], r[7]))
    n_aliases: dict[str, int] = {}
    for canon in cmap.values():
        n_aliases[canon] = n_aliases.get(canon, 0) + 1
    agg: dict[str, list[int]] = {}
    for s, p, o, lab, dt, ot in triple_set:
        a = agg.setdefault(s, [0, 0])
        a[0] += 1
        a[1] ^= xxh64_str("|".join((p, o, lab, dt, ot))) & _U64
    out = [
        (
            canon,
            n_aliases[canon],
            agg.get(canon, [0, 0])[0],
            _signed64(agg.get(canon, [0, 0])[1]),
        )
        for canon in sorted(n_aliases)
    ]
    return ["subject", "n_aliases", "n_triples", "triple_fp"], out


def _wl_fingerprint(doc_rows: list[tuple], rounds: int = 3) -> tuple[int, int, int]:
    """(graph_fp signed, n_triples, n_blanks) for one document's
    triples — plain-dict Weisfeiler-Leman refinement vs the engine's
    join/agg rounds.  ``doc_rows`` are (s, p, o, label, dt, ot)."""
    incident: dict[str, list[tuple[str, str, int | None]]] = {}
    for s, p, o, label, dt, ot in doc_rows:
        if s.startswith("_:"):
            static = (
                None
                if ot == "iri" and o.startswith("_:")
                else _signed64(xxh64_str("|".join((o, label, dt, ot))))
            )
            incident.setdefault(s, []).append((f"s|{p}", o, static))
        if ot == "iri" and o.startswith("_:"):
            static = (
                None
                if s.startswith("_:")
                else _signed64(xxh64_str(s + "|||iri"))
            )
            incident.setdefault(o, []).append((f"o|{p}", s, static))
    colors = {b: 0 for b in incident}
    for _ in range(rounds):
        nxt = {}
        for b, edges in incident.items():
            msgs = sorted(
                f"{edge}|{colors[other] if static is None else static}"
                for edge, other, static in edges
            )
            nxt[b] = _signed64(xxh64_str(",".join(msgs)))
        colors = nxt
    fp = 0
    for s, p, o, label, dt, ot in doc_rows:
        scode = colors.get(s)
        if scode is None:
            scode = _signed64(xxh64_str(s + "|||iri"))
        ocode = colors.get(o) if ot == "iri" else None
        if ocode is None:
            ocode = _signed64(xxh64_str("|".join((o, label, dt, ot))))
        fp ^= xxh64_str(f"{scode}|{p}|{ocode}|{ot}") & _U64
    return _signed64(fp), len(doc_rows), len(colors)


def ref_q_graph_fingerprint() -> tuple[list[str], list[tuple]]:
    """Blank-invariant per-document graph fingerprints.  The
    invariance PROOF (fingerprint of a blank-RENAMED copy must be
    identical) lives in pytest now —
    tests/test_fingerprint.py::test_corpus_fingerprints_blank_invariant
    recomputes every corpus fingerprint on a renamed copy — so the
    bench query pays for one fingerprint pass, not two."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    docs: dict[str, list[tuple]] = {}
    for r in rows:
        docs.setdefault(r[0], []).append((r[2], r[3], r[4], r[5], r[6], r[7]))

    out = []
    for doc_id in sorted(docs):
        fp, n_t, n_b = _wl_fingerprint(docs[doc_id])
        if n_b == 0:
            continue
        out.append((doc_id, fp, n_t, n_b))
    return ["doc_id", "graph_fp", "n_triples", "n_blanks"], out


def _xxh64_int32(v: int, seed: int = 42) -> int:
    """Spark ``xxhash64`` over an IntegerType column: XXH64 of the
    4-byte little-endian value (verified against the engine)."""
    import struct

    return xxh64(struct.pack("<i", v), seed)


def _xxh64_int64(v: int, seed: int = 42) -> int:
    """Spark ``xxhash64`` over a LongType column: XXH64 of the 8-byte
    little-endian two's-complement value; multi-column calls chain the
    previous column's hash as the next seed (verified)."""
    import struct

    return xxh64(struct.pack("<q", v), seed)


def ref_q_pipeline_lineage() -> tuple[list[str], list[tuple]]:
    """Stage-by-stage row counts of the FULL KG-construction pipeline
    (plans/pipeline.py::run_pipeline) over the 200-doc corpus +
    fixtures — extract, distinct mention terms, verified link edges
    (MinHash-LSH with the pipeline's clique guards: bucket_cap=64,
    salted cap order, neighbor_window=8, src_degree_cap=8, shingle
    k=4, threshold=0.6), connected components, canonical map,
    deduplicated canonical triples, bucketed materialization.  Every
    count recomputed with pure loops + union-find sharing only the
    spec.  ``resumed_second_run`` pins the manifest's resume contract:
    the query runs the pipeline TWICE and the second run must serve
    every stage from committed checkpoints."""
    docs = _corpus_docs(200) + _fixture_docs()
    triples = _extract_all(docs)
    n_extract = len(triples)

    terms: dict[int, str] = {}
    for (_d, _seq, sub, _p, obj, _label, _dt, ot) in triples:
        if not sub.startswith("_:"):
            terms.setdefault(_signed64(xxh64_str(sub)), sub)
        if ot == "iri" and not obj.startswith("_:"):
            terms.setdefault(_signed64(xxh64_str(obj)), obj)
    n_terms = len(terms)

    a, b = minhash_perm_coeffs(128, seed=7)
    buckets: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for tid, text in terms.items():
        sig = minhash_sig(char_shingles(text or "", 4), a, b)
        for bi, bh in enumerate(band_fold(sig, 32)):
            salt = _signed64(_xxh64_int64(tid, seed=_xxh64_int32(bi)))
            buckets.setdefault((bi, bh), []).append((salt, tid))
    raw_pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        members.sort()  # salted cap order (engine: row_number by salt)
        kept = sorted(t for _s, t in members[:64])  # bucket_cap, then sort_array
        n = len(kept)
        for i, x in enumerate(kept):
            for y in kept[i + 1 : i + 1 + min(8, n - i - 1)]:  # neighbor_window
                raw_pairs.add((x, y))
    by_src: dict[int, set[int]] = {}
    for s_, d_ in raw_pairs:
        by_src.setdefault(s_, set()).add(d_)
    edges = [
        (s_, d_)
        for s_, ds in by_src.items()
        for d_ in sorted(ds)[:8]  # src_degree_cap smallest distinct dsts
        if jaccard_shingles(terms[s_] or "", terms[d_] or "", 4) >= 0.6
    ]
    n_edges = len(edges)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes: set[int] = set()
    for s_, d_ in edges:
        nodes.add(s_)
        nodes.add(d_)
        ra, rb = find(s_), find(d_)
        if ra != rb:
            parent[ra] = rb
    n_components = len(nodes)

    comp_members: dict[int, list[int]] = {}
    for nd in nodes:
        comp_members.setdefault(find(nd), []).append(nd)
    cmap: dict[int, tuple[str, str]] = {}
    for members in comp_members.values():
        canon = min(terms[m] for m in members)
        for m in members:
            if terms[m] != canon:
                cmap[m] = (terms[m], canon)
    n_cmap = len(cmap)

    canon_set: set[tuple] = set()
    for (_d, _seq, sub, pred, obj, label, dt, ot) in triples:
        sid = _signed64(xxh64_str(sub))
        if sid in cmap and cmap[sid][0] == sub:
            sub = cmap[sid][1]
        if ot == "iri":
            oid = _signed64(xxh64_str(obj))
            if oid in cmap and cmap[oid][0] == obj:
                obj = cmap[oid][1]
        canon_set.add((sub, pred, obj, label, dt, ot))
    n_canon = len(canon_set)

    rows = [
        ("canonical_map", n_cmap, True),
        ("canonical_triples", n_canon, True),
        ("components", n_components, True),
        ("edges", n_edges, True),
        ("extract", n_extract, True),
        ("materialize", n_canon, True),
        ("terms", n_terms, True),
    ]
    return ["stage", "rows", "resumed_second_run"], rows


def ref_q_kg_temporal() -> tuple[list[str], list[tuple]]:
    """Bitemporal layer: synthesized version history, interval
    coalescing, as-of snapshots, per-predicate delta — all as plain
    loops vs the engine's window islands + anti-joins."""
    t1, t2 = 800, 2500
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    triples = sorted({(r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows})

    hist: dict[tuple, list[tuple[int, int]]] = {}
    for t in triples:
        a = abs(_signed64(xxh64_str("|".join(t))))
        nv, off, ln = a % 3, a % 400, a % 1400
        ivs = [
            (i * 1000 + off, i * 1000 + off + 300 + ln) for i in range(nv + 1)
        ]
        # coalesce: merge when next start <= running max end (half-open
        # adjacency merges)
        merged = []
        for s, e in sorted(ivs):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        hist[t] = merged

    stats: dict[str, list] = {}
    live1, live2 = set(), set()
    for t, ivs in hist.items():
        st = stats.setdefault(t[1], [0, 0, 0, 0])
        a = abs(_signed64(xxh64_str("|".join(t))))
        st[0] += (a % 3) + 1  # raw version rows
        st[1] += len(ivs)
        if any(s <= t1 < e for s, e in ivs):
            st[2] += 1
            live1.add(t)
        if any(s <= t2 < e for s, e in ivs):
            st[3] += 1
            live2.add(t)

    def member_fp(ts) -> int:
        fp = 0
        for t in ts:
            fp ^= xxh64_str("|".join((t[0], t[2], t[3], t[4], t[5]))) & _U64
        return _signed64(fp)

    out = []
    for pred in sorted(stats):
        added = [t for t in live2 - live1 if t[1] == pred]
        removed = [t for t in live1 - live2 if t[1] == pred]
        st = stats[pred]
        out.append(
            (
                pred,
                st[0],
                st[1],
                st[2],
                st[3],
                len(added),
                len(removed),
                member_fp(added),
                member_fp(removed),
            )
        )
    return (
        [
            "predicate", "n_raw", "n_intervals", "n_t1", "n_t2",
            "n_added", "n_removed", "added_fp", "removed_fp",
        ],
        out,
    )


def _grid_phash_py(img) -> int:
    """Independent sampled-grid perceptual hash: plain Python loops
    (vs the engine's vectorized numpy) — integer ITU-R 601 luma at
    the 8x8 nearest-sample grid, thresholded at the grid mean."""
    h = len(img)
    w = len(img[0])
    samples = []
    for i in range(8):
        for j in range(8):
            px = img[(i * h) // 8][(j * w) // 8]
            samples.append(
                (299 * int(px[0]) + 587 * int(px[1]) + 114 * int(px[2])) // 1000
            )
    mean = sum(samples) / 64.0
    out = 0
    for s in samples:
        out = (out << 1) | (1 if s > mean else 0)
    return out


def ref_q_image_phash() -> tuple[list[str], list[tuple]]:
    """Perceptual-hash image near-dup pairs over originals + perturbed
    (brightness+16 clipped, 2x-upscaled, codec-flipped) variants.
    The brute-force all-pairs loop vs the engine's band-blocked join:
    with 4 bands and max_hamming 3 the pigeonhole guarantees every
    qualifying pair shares a band, so discovered == all pairs with
    Hamming <= 3."""
    hashes: dict[str, int] = {}
    for ref, _doc, mtype, _plen, _dur, img, _audio, _vid in _corpus_media(200):
        if mtype != "image":
            continue
        hashes[ref] = _grid_phash_py(img)
        h = len(img)
        w = len(img[0])
        var = [
            [
                [min(int(c) + 16, 255) for c in img[r // 2][x // 2]]
                for x in range(2 * w)
            ]
            for r in range(2 * h)
        ]
        hashes[ref + "#v"] = _grid_phash_py(var)
    refs = sorted(hashes)
    out = []
    for i, r1 in enumerate(refs):
        for r2 in refs[i + 1:]:
            d = bin(hashes[r1] ^ hashes[r2]).count("1")
            if d <= 3:
                out.append((r1, r2, d))
    return ["id1", "id2", "hamming"], out


def ref_q_sparql_update() -> tuple[list[str], list[tuple]]:
    """SPARQL UPDATE (DELETE/INSERT WHERE) — hand-applied set rewrite:
    drop every (d hasMedia m), add (m attachedTo d) + (m a Media),
    grouped per predicate with the full-term XOR fingerprint."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    ns = "http://turtle-spark.dev/ns#"
    base = {(r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows}
    sols = {(r[2], r[4]) for r in rows if r[3] == HAS_MEDIA and r[7] == "iri"}
    deleted = {(d, HAS_MEDIA, m) for d, m in sols}
    graph = {t for t in base if (t[0], t[1], t[2]) not in deleted}
    for d, m in sols:
        graph.add((m, ns + "attachedTo", d, "", "", "iri"))
        graph.add((m, _RDF_TYPE, ns + "Media", "", "", "iri"))
    agg: dict[str, tuple[int, int]] = {}
    for s, p, o, label, dt, ot in graph:
        n, fp = agg.setdefault(p, (0, 0))
        agg[p] = (
            n + 1,
            fp ^ (xxh64_str(f"{s}|{o}|{label}|{dt}|{ot}") & _U64),
        )
    out = [(p, n, _signed64(fp)) for p, (n, fp) in sorted(agg.items())]
    return ["predicate", "n_triples", "triple_fp"], out


def ref_q_void_stats() -> tuple[list[str], list[tuple]]:
    """VoID statistics — dict/set recount of dataset totals, property
    partitions, and class partitions over the deduped triple set."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    g = {(r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows}

    ds_fp = 0
    ds_subs: set[str] = set()
    props: dict[str, tuple[int, set, int]] = {}
    classes: dict[str, tuple[int, set, int]] = {}
    for s, p, o, label, dt, ot in g:
        ds_fp ^= xxh64_str(f"{s}|{p}|{o}") & _U64
        ds_subs.add(s)
        n, subs, fp = props.setdefault(p, (0, set(), 0))
        subs.add(s)
        props[p] = (n + 1, subs, fp ^ (xxh64_str(f"{s}|{o}") & _U64))
        if p == _RDF_TYPE and ot == "iri":
            n, subs, fp = classes.setdefault(o, (0, set(), 0))
            subs.add(s)
            classes[o] = (n + 1, subs, fp ^ (xxh64_str(s) & _U64))

    out = [("dataset", "(all)", len(g), len(ds_subs), _signed64(ds_fp))]
    for key, (n, subs, fp) in props.items():
        out.append(("propertyPartition", key, n, len(subs), _signed64(fp)))
    for key, (n, subs, fp) in classes.items():
        out.append(("classPartition", key, n, len(subs), _signed64(fp)))
    out.sort(key=lambda r: (r[0], r[1]))
    return ["part", "key", "n_triples", "n_entities", "member_fp"], out


def ref_q_owl_entail() -> tuple[list[str], list[tuple]]:
    """OWL 2 RL property-rule delta — loop/BFS recount: derive the
    same data-driven 4-predicate ontology (edge count desc, name asc,
    rdf: excluded), apply prp-inv1/2, prp-symp, prp-trp by hand,
    subtract asserted triples, group per (rule, predicate)."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    rdf_ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

    counts: dict[str, int] = {}
    for r in rows:
        if r[7] == "iri" and not r[3].startswith(rdf_ns):
            counts[r[3]] = counts.get(r[3], 0) + 1
    top = [p for p, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:4]]

    base = {(r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows}
    edges = {(r[2], r[3], r[4]) for r in rows if r[7] == "iri"}

    derived: set[tuple] = set()
    for s, p, o in edges:
        if p == top[0]:
            derived.add(("prp-inv1", o, top[1], s))
        if p == top[1]:
            derived.add(("prp-inv2", o, top[0], s))
        if p == top[2]:
            derived.add(("prp-symp", o, top[2], s))
    adj: dict[str, set] = {}
    for s, p, o in edges:
        if p == top[3]:
            adj.setdefault(s, set()).add(o)
    for src in adj:
        seen: set[str] = set()
        stack = list(adj[src])
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            stack.extend(adj.get(v, ()))
        for dst in seen:
            derived.add(("prp-trp", src, top[3], dst))

    agg: dict[tuple, tuple[int, int]] = {}
    for rule, s, p, o in derived:
        if (s, p, o, "", "", "iri") in base:
            continue
        n, fp = agg.setdefault((rule, p), (0, 0))
        agg[(rule, p)] = (n + 1, fp ^ (xxh64_str(f"{s}|{o}") & _U64))
    out = [
        (rule, p, n, _signed64(fp))
        for (rule, p), (n, fp) in sorted(agg.items())
    ]
    return ["rule", "predicate", "n_new", "new_fp"], out


def ref_q_owl_chains() -> tuple[list[str], list[tuple]]:
    """prp-spo2 property chains — python dict joins over the two
    busiest IRI predicates, same derived-ontology convention as
    ref_q_owl_entail."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    rdf_ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    edges = sorted({(r[2], r[3], r[4]) for r in rows if r[7] == "iri"})
    nonrdf = [(s2, p, o) for s2, p, o in edges if not p.startswith(rdf_ns)]
    out_by_subj: dict[str, list[str]] = {}
    for s2, p, _o in nonrdf:
        out_by_subj.setdefault(s2, []).append(p)
    pair_cnt: dict[tuple[str, str], int] = {}
    for _s, p1, mid in nonrdf:
        for p2 in out_by_subj.get(mid, []):
            pair_cnt[(p1, p2)] = pair_cnt.get((p1, p2), 0) + 1
    top_pairs = sorted(pair_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    axioms = [
        (f"urn:chain:{i + 1}", p1, p2)
        for i, ((p1, p2), _c) in enumerate(top_pairs)
    ]
    asserted = {
        (r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows
    }
    out_rows = []
    for head, p1, p2 in axioms:
        by_mid: dict[str, list[str]] = {}
        for s2, p, o in nonrdf:
            if p == p2:
                by_mid.setdefault(s2, []).append(o)
        derived = set()
        for s1, p, mid in nonrdf:
            if p != p1:
                continue
            for o in by_mid.get(mid, []):
                trip = (s1, head, o, "", "", "iri")
                if trip not in asserted:
                    derived.add((s1, o))
        if derived:
            fp = 0
            for s1, o in derived:
                fp ^= xxh64_str(s1 + "|" + o)
            out_rows.append(("prp-spo2", head, len(derived), _signed64(fp)))
    out_rows.sort(key=lambda r: (r[0], r[1]))
    return ["rule", "predicate", "n_new", "new_fp"], out_rows


def ref_q_bnode_canonical() -> tuple[list[str], list[tuple]]:
    """WL color refinement on the blank-node subgraph — dict-loop
    mirror of operators/canonicalize.canonical_blank_labels (4 rounds,
    edge MULTIPLICITY preserved: the engine's collect_list is a
    multiset), grouped per canonical label."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    # (bnode, dir, predicate, neighbor-or-None, ground-term-or-None)
    edges: list[tuple] = []
    for r in rows:
        s, p, o, label, dt, ot = r[2], r[3], r[4], r[5], r[6], r[7]
        bn_obj = ot == "iri" and o.startswith("_:")
        if s.startswith("_:"):
            if bn_obj:
                edges.append((s, "out", p, o, None))
            else:
                edges.append((s, "out", p, None, f"{o}\x1e{label}\x1e{dt}\x1e{ot}"))
        if bn_obj:
            if s.startswith("_:"):
                edges.append((o, "in", p, s, None))
            else:
                edges.append((o, "in", p, None, s))

    h0 = xxh64_str("bn")
    colors = {e[0]: h0 for e in edges}
    for _ in range(4):
        sigs: dict[str, list[str]] = {}
        for bn, d, p, neigh, term in edges:
            val = str(colors[neigh]) if neigh is not None else term
            sigs.setdefault(bn, []).append(f"{d}\x1f{p}\x1f{val}")
        colors = {
            bn: xxh64_str("\x1d".join(sorted(sl))) for bn, sl in sigs.items()
        }

    agg: dict[int, tuple[int, int]] = {}
    for bn, canon in colors.items():
        n, fp = agg.setdefault(canon, (0, 0))
        agg[canon] = (n + 1, fp ^ (xxh64_str(bn) & _U64))
    out = [(c, n, _signed64(fp)) for c, (n, fp) in sorted(agg.items())]
    return ["canon", "n_bnodes", "bnode_fp"], out


def ref_q_prefix_induction() -> tuple[list[str], list[tuple]]:
    """Namespace induction — greedy-regex namespace split (up to the
    LAST / or #, matching Spark's greedy regexp_extract), occurrence
    and distinct-IRI counts, rank by (count desc, namespace asc)."""
    import re

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    pat = re.compile(r"^(.*[/#])")
    occ: dict[str, int] = {}
    distinct: dict[str, set] = {}

    def add(iri: str) -> None:
        m = pat.match(iri)
        if not m or not m.group(1):
            return
        ns = m.group(1)
        occ[ns] = occ.get(ns, 0) + 1
        distinct.setdefault(ns, set()).add(iri)

    for _doc, _seq, s, p, o, _label, _dt, ot in rows:
        if not s.startswith("_:"):
            add(s)
        add(p)
        if ot == "iri" and not o.startswith("_:"):
            add(o)
    ranked = sorted(occ, key=lambda ns: (-occ[ns], ns))
    out = [
        (f"ns{i + 1}", ns, occ[ns], len(distinct[ns]))
        for i, ns in enumerate(ranked)
    ]
    return ["prefix", "namespace", "n_occurrences", "n_distinct_iris"], out


def ref_q_skolemize() -> tuple[list[str], list[tuple]]:
    """Skolemization — md5-hex genid IRIs for blank labels, grouped by
    predicate over the triples that were touched."""
    import hashlib

    base = "https://turtle-spark.dev/.well-known/genid/"
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    agg: dict[str, tuple[int, int]] = {}
    for _doc, _seq, s, p, o, _label, _dt, ot in rows:
        touched = False
        if s.startswith("_:"):
            s = base + hashlib.md5(s[2:].encode("utf-8")).hexdigest()
            touched = True
        if ot == "iri" and o.startswith("_:"):
            o = base + hashlib.md5(o[2:].encode("utf-8")).hexdigest()
            touched = True
        if not touched:
            continue
        n, fp = agg.setdefault(p, (0, 0))
        agg[p] = (n + 1, fp ^ (xxh64_str(s + "|" + o) & _U64))
    out = [(p, n, _signed64(fp)) for p, (n, fp) in sorted(agg.items())]
    return ["predicate", "n_triples", "sk_fp"], out


def ref_q_property_table() -> tuple[list[str], list[tuple]]:
    """Property-table pivot — functional predicates ranked by
    (n_triples desc, predicate asc) capped at 8; per-subject min
    object per column; rows fingerprinted byte-for-byte."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    fan: dict[str, dict[str, set]] = {}
    n_tr: dict[str, int] = {}
    for r in rows:
        n_tr[r[3]] = n_tr.get(r[3], 0) + 1
        fan.setdefault(r[3], {}).setdefault(r[2], set()).add(r[4])
    functional = [
        p for p, subs in fan.items() if max(len(v) for v in subs.values()) == 1
    ]
    chosen = sorted(functional, key=lambda p: (-n_tr[p], p))[:8]
    pos = {p: i for i, p in enumerate(chosen)}
    table: dict[str, list] = {}
    for r in rows:
        if r[3] not in pos:
            continue
        vals = table.setdefault(r[2], [None] * len(chosen))
        i = pos[r[3]]
        vals[i] = r[4] if vals[i] is None else min(vals[i], r[4])
    agg: dict[int, tuple[int, int]] = {}
    for subj, vals in table.items():
        n_filled = sum(1 for v in vals if v is not None)
        line = subj + "|" + "|".join(v or "" for v in vals)
        n, fp = agg.setdefault(n_filled, (0, 0))
        agg[n_filled] = (n + 1, fp ^ (xxh64_str(line) & _U64))
    out = [(k, n, _signed64(fp)) for k, (n, fp) in sorted(agg.items())]
    return ["n_filled", "n_subjects", "row_fp"], out


def ref_q_lm_quality(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Quantized trigram-LM quality — dict model over the doc_id%10==0
    slice, bit_length floor-log2 scoring (matches the engine's
    ``length(bin(1+c)) - 1``)."""
    import pandas as pd

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def trigrams(t: str) -> list[str]:
        t = (t or "").lower()
        return [t[i : i + 3] for i in range(len(t) - 2)] if len(t) >= 3 else []

    model: dict[str, int] = {}
    rows = list(zip(d["doc_id"].tolist(), d["text"].tolist()))
    for did, t in rows:
        if int(did) % 10 == 0:
            for g in trigrams(t):
                model[g] = model.get(g, 0) + 1
    out = []
    for did, t in rows:
        did = int(did)
        if did % 10 == 0:
            continue
        gs = trigrams(t)
        if not gs:
            continue  # engine's explode+groupBy never sees gram-less docs
        num = sum((1 + model.get(g, 0)).bit_length() - 1 for g in gs)
        oov = sum(1 for g in gs if g not in model)
        out.append((did, len(gs), num, oov, num / len(gs)))
    out.sort()
    return ["doc_id", "n_grams", "score_num", "n_oov", "lm_q"], out


def ref_q_dsir_weights(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Quantized DSIR — 4096 hashed word-bigram buckets, target =
    lang 'en', floor-log2 count ratio per bigram occurrence."""
    import pandas as pd
    import re

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pat = re.compile(r"[a-z]+")

    def buckets(t: str) -> list[int]:
        ws = pat.findall((t or "").lower())
        return [
            pmod(xxh64_str(ws[i] + " " + ws[i + 1]), 4096)
            for i in range(len(ws) - 1)
        ]

    rows = [
        (int(did), lang, buckets(t))
        for did, lang, t in zip(
            d["doc_id"].tolist(), d["lang"].tolist(), d["text"].tolist()
        )
    ]
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for _did, lang, bks in rows:
        for bk in bks:
            raw[bk] = raw.get(bk, 0) + 1
            if lang == "en":
                tgt[bk] = tgt.get(bk, 0) + 1
    out = []
    for did, _lang, bks in rows:
        if not bks:
            continue
        num = sum(
            ((1 + tgt.get(bk, 0)).bit_length() - 1)
            - ((1 + raw[bk]).bit_length() - 1)
            for bk in bks
        )
        out.append((did, len(bks), num, num / len(bks)))
    out.sort()
    return ["doc_id", "n_bigrams", "weight_num", "dsir_w"], out


def ref_q_sketch_recall(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """LSH recall vs brute-force exact ground truth — all-pairs
    distinct-shingle Jaccard >= 0.5 compared with _minhash_edges (the
    engine's banding/caps pipeline re-derivation)."""
    docs = _read_documents(sf_dir)
    sets = {
        int(did): set(int(v) for v in char_shingles(t or "", 5))
        for did, t in docs
    }
    ids = sorted(sets)
    true_pairs = set()
    for i, x in enumerate(ids):
        sx = sets[x]
        for y in ids[i + 1 :]:
            sy = sets[y]
            un = len(sx | sy)
            j = (len(sx & sy) / un) if un else 1.0
            if j >= 0.5:
                true_pairs.add((x, y))
    lsh = {(int(s), int(d)) for s, d, _ in _minhash_edges(docs)}
    tp = true_pairs & lsh
    missed = true_pairs - lsh
    extra = lsh - true_pairs
    recall = len(tp) / len(true_pairs) if true_pairs else None
    row = (len(true_pairs), len(lsh), len(tp), len(missed), len(extra), recall)
    return ["n_true", "n_lsh", "n_tp", "n_missed", "n_extra", "recall"], [row]



def ref_q_hits() -> tuple[list[str], list[tuple]]:
    """Fixed-point integer HITS — plain dict loops vs the engine's
    join/agg half-steps; sum-normalization in exact ints makes both
    bit-identical (mirrors operators/graph.py::hits)."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    edges = sorted({(r[2], r[4]) for r in rows if r[7] == "iri" and r[2] != r[4]})
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    scale = 1_000_000
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}

    def norm(scores):
        total = sum(scores.values())
        if total == 0:
            return scores
        return {n: v * scale // total for n, v in scores.items()}

    out_nbrs: dict[str, list[str]] = {}
    in_nbrs: dict[str, list[str]] = {}
    for s, d in edges:
        out_nbrs.setdefault(s, []).append(d)
        in_nbrs.setdefault(d, []).append(s)
    for _ in range(8):
        auth = norm({n: sum(hub[s] for s in in_nbrs.get(n, ())) for n in nodes})
        hub = norm({n: sum(auth[d] for d in out_nbrs.get(n, ())) for n in nodes})
    top = sorted(nodes, key=lambda n: (-auth[n], n))[:20]
    return ["node", "hub_fp", "auth_fp"], [(n, hub[n], auth[n]) for n in top]


def ref_q_link_predict() -> tuple[list[str], list[tuple]]:
    """Quantized Adamic-Adar link prediction — loops + dict wedges vs
    the engine's in-array wedge expansion (same neighbor_cap=64 and
    integer bit-length weights; mirrors graph.py::link_prediction)."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    edges = sorted({(r[2], r[4]) for r in rows if r[7] == "iri" and r[2] != r[4]})
    scale, cap = 1_000_000, 64
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    scored: dict[tuple[str, str], list[int]] = {}
    for z, nbrs in adj.items():
        deg = len(nbrs)
        if deg < 2:
            continue
        w = scale // (deg.bit_length() - 1)
        capped = sorted(nbrs)[:cap]
        for i, a in enumerate(capped):
            for b in capped[i + 1:]:
                cell = scored.setdefault((a, b), [0, 0])
                cell[0] += 1
                cell[1] += w
    preds = [
        (a, b, n, s)
        for (a, b), (n, s) in scored.items()
        if b not in adj.get(a, set())
    ]
    preds.sort(key=lambda r: (-r[3], r[0], r[1]))
    return ["a", "b", "n_common", "aa_fp"], preds[:30]



def ref_q_trig_export() -> tuple[list[str], list[tuple]]:
    """TriG encode layout — per-graph block bytes + fingerprint,
    rendered with the fixture-pinned GraphBuffer core grouped by the
    quad model's one-graph-per-document provenance (mirrors
    sources/trig.py::graph_blocks)."""
    from turtle_spark.core.serializer import GraphBuffer

    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    by_graph: dict[str, set] = {}
    for doc_id, _seq, s, p, o, label, datatype, otype in rows:
        by_graph.setdefault("urn:graph:" + doc_id, set()).add(
            (s, p, o, label, datatype, otype)
        )
    out = []
    for graph in sorted(by_graph):
        g = GraphBuffer()
        # same deterministic insertion order as graph_blocks: the
        # buffer's object sort is stable on lexical form only
        for s, p, o, label, datatype, otype in sorted(
            by_graph[graph], key=lambda t: (t[0], t[1], t[2], t[4], t[3])
        ):
            g.accept_annotated(s, p, o, label, datatype, otype)
        text = f"<{graph}> {{\n{g.render(include_pragmas=False)}}}\n"
        out.append((graph, len(text), xxh64_str(text)))
    return ["graph", "n_chars", "block_fp"], out



def _json_esc(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def ref_q_jsonld_export() -> tuple[list[str], list[tuple]]:
    """JSON-LD node-object lines — byte-exact mirror of the encode
    chain in sources/jsonld.py (same escape set, same key/value sort),
    aggregated per 32-way subject hash bucket."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    by_sub: dict[str, dict[str, set]] = {}
    for _doc, _seq, s, p, o, label, datatype, otype in rows:
        if otype == "literal":
            v = '{"@value":"' + _json_esc(o) + '"'
            if label:
                v += ',"@language":"' + _json_esc(label) + '"'
            elif datatype:
                dt = datatype[1:-1] if datatype.startswith("<") and datatype.endswith(">") else datatype
                v += ',"@type":"' + _json_esc(dt) + '"'
            v += "}"
        else:
            v = '{"@id":"' + _json_esc(o) + '"}'
        by_sub.setdefault(s, {}).setdefault(p, set()).add(v)
    agg: dict[str, list[int]] = {}
    for s in by_sub:
        entries = [
            '"' + _json_esc(p) + '":[' + ",".join(sorted(vs)) + "]"
            for p, vs in sorted(by_sub[s].items())
        ]
        line = '{"@id":"' + _json_esc(s) + '",' + ",".join(entries) + "}"
        cell = agg.setdefault(pmod(xxh64_str(s), 32), [0, 0, 0])
        cell[0] += 1
        cell[1] += len(line)
        cell[2] ^= xxh64_str(line)
    out = [
        (b, n, total, _signed64(fp))
        for b, (n, total, fp) in sorted(agg.items())
    ]
    return ["bucket", "n_lines", "total_chars", "line_fp"], out



def _dot_esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def ref_q_dot_export() -> tuple[list[str], list[tuple]]:
    """DOT edge lines — byte-exact mirror of sources/dot.py's escape
    and line format, per 32-way subject hash bucket."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    edges = sorted(
        {(s, p, o) for _d, _q, s, p, o, _l, _dt, ot in rows if ot == "iri"}
    )
    agg: dict[int, list[int]] = {}
    for s, p, o in edges:
        line = (
            '  "' + _dot_esc(s) + '" -> "' + _dot_esc(o)
            + '" [label="' + _dot_esc(p) + '"];'
        )
        cell = agg.setdefault(pmod(xxh64_str(s), 32), [0, 0, 0])
        cell[0] += 1
        cell[1] += len(line)
        cell[2] ^= xxh64_str(line)
    out = [
        (b, n, total, _signed64(fp))
        for b, (n, total, fp) in sorted(agg.items())
    ]
    return ["bucket", "n_lines", "total_chars", "line_fp"], out


def ref_q_functional_conflicts() -> tuple[list[str], list[tuple]]:
    """Functional-property conflict report — dict loops vs the
    engine's two-level aggregation (mirrors
    graph.py::functional_conflicts, max_violation_pct=25)."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    per: dict[str, dict[str, set]] = {}
    for _doc, _seq, s, p, o, label, datatype, otype in rows:
        per.setdefault(p, {}).setdefault(s, set()).add((o, label, datatype, otype))
    out = []
    for p in sorted(per):
        subs = per[p]
        multi = {s for s, objs in subs.items() if len(objs) > 1}
        if not multi or len(multi) * 100 > 25 * len(subs):
            continue
        fp = 0
        for s in multi:
            fp ^= xxh64_str(s)
        out.append(
            (
                p,
                len(subs),
                len(multi),
                max(len(objs) for objs in subs.values()),
                _signed64(fp),
            )
        )
    return ["predicate", "n_subjects", "n_multi", "max_objects", "conflict_fp"], out



def ref_q_ppr() -> tuple[list[str], list[tuple]]:
    """Personalized PageRank from the 3 highest-out-degree entities —
    dict loops vs the engine's join/agg iterations (mirrors
    graph.py::personalized_pagerank; exact ints both sides)."""
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    edges = sorted({(r[2], r[4]) for r in rows if r[7] == "iri" and r[2] != r[4]})
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    seeds = {n for n, _ in sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:3]}
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    seed_mass = 15 * _PR_SCALE // 100
    base = {n: (seed_mass if n in seeds else 0) for n in nodes}
    rank = dict(base)
    for _ in range(10):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // deg[s]
        rank = {n: base[n] + 85 * inflow[n] // 100 for n in nodes}
    top = sorted(
        ((n, r) for n, r in rank.items() if r > 0),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]
    return ["node", "rank_fp"], top


# --------------------------------------------------------------------------
# cardinality / frequency sketches (operators/sketches.py spec):
# sequential dict loops vs the engine's register shuffle + broadcast
# grid.  The float numerators are IMPORTED from the engine module so
# both sides divide the same IEEE-754 constant.
# --------------------------------------------------------------------------

def _sketch_consts():
    from turtle_spark.operators.sketches import (
        CM_DEPTH, CM_WIDTH, HLL_M, HLL_NUM, HLL_P, KMV_K, KMV_NUM,
    )

    return CM_DEPTH, CM_WIDTH, HLL_M, HLL_NUM, HLL_P, KMV_K, KMV_NUM


def _hll_est(values) -> float:
    _, _, m, num, p, _, _ = _sketch_consts()
    regs: dict[int, int] = {}
    for v in values:
        hu = xxh64_str(str(v)) & _M64
        reg = hu >> (64 - p)
        w = (hu << p) & _M64
        rho = (64 - p + 1) if w == 0 else 65 - w.bit_length()
        if rho > regs.get(reg, 0):
            regs[reg] = rho
    zeros = m - len(regs)
    s_total = sum(1 << (53 - mj) for mj in regs.values()) + zeros * (1 << 53)
    raw = num / float(s_total)
    if raw <= 2.5 * m and zeros > 0:
        est = float(m) * math.log(float(m) / float(zeros))
    else:
        est = raw
    return spark_round(est, 4)


def _kmv_est(values) -> float:
    _, _, _, _, _, k, num = _sketch_consts()
    hs = sorted({xxh64_str(str(v)) for v in values})
    if len(hs) < k:
        return float(len(hs))
    u_k = float(hs[k - 1]) + float(1 << 63)
    return spark_round(num / u_k, 4)


def ref_q_sketch_cardinality() -> tuple[list[str], list[tuple]]:
    rows = _extract_all(_corpus_docs(200) + _fixture_docs())
    per_pred: dict[str, list] = {}
    for r in rows:
        per_pred.setdefault(r[3], []).append(r[4])
    out = [
        (pred, len(set(objs)), _hll_est(objs), _kmv_est(objs))
        for pred, objs in sorted(per_pred.items())
    ]
    return ["predicate", "n_exact", "hll_est", "kmv_est"], out


def ref_q_compression_ratio(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """DEFLATE ratio per doc — same zlib, same level, independent loop."""
    import zlib

    import pandas as pd

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = []
    for doc_id, text in sorted(zip(d.doc_id.astype(int), d.text.fillna(""))):
        raw = text.encode("utf-8") if text else b""
        nb = len(raw)
        nc = len(zlib.compress(raw, 6)) if raw else 0
        out.append((doc_id, nb, nc, 0.0 if nb == 0 else nc / nb))
    return ["doc_id", "n_bytes", "n_compressed", "compression_ratio"], out


def ref_q_sketch_setops(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """KMV set operations between the click and purchase user sets —
    python min-k vs the engine's two-phase windowed sketches."""
    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    k = 128
    a = set(ev[ev.event_type == "click"].user_id.astype(int))
    b = set(ev[ev.event_type == "purchase"].user_id.astype(int))

    def kept(vals) -> list[int]:
        return sorted({xxh64_str(str(v)) for v in vals})[:k]

    ka, kb = kept(a), kept(b)
    sa, sb = set(ka), set(kb)
    merged = sorted(sa | sb)[:k]
    n_kept = len(merged)
    n_both = sum(1 for h in merged if h in sa and h in sb)
    if n_kept < k:
        union_est = float(n_kept)
    else:
        u_k = float(merged[k - 1]) + float(1 << 63)
        union_est = (k - 1.0) * float(1 << 64) / u_k
    jac = n_both / n_kept
    out = [(
        "click", "purchase", len(a), len(b), len(a | b), len(a & b),
        spark_round(union_est, 4), spark_round(jac, 6),
        spark_round(union_est * jac, 4),
    )]
    return [
        "set_a", "set_b", "exact_a", "exact_b", "exact_union",
        "exact_inter", "union_est", "jaccard_est", "inter_est",
    ], out


def ref_q_heavy_hitters(sf_dir: str) -> tuple[list[str], list[tuple]]:
    import re
    from collections import Counter

    d, w, _, _, _, _, _ = _sketch_consts()
    docs = _read_documents(sf_dir)
    true_cnt: Counter = Counter()
    grid: Counter = Counter()
    for _doc_id, text in docs:
        for tok in re.findall("[a-z]+", (text or "").lower()):
            true_cnt[tok] += 1
            for i in range(d):
                grid[(i, pmod(xxh64_str(f"{i}|{tok}"), w))] += 1
    out = []
    for tok, n in sorted(true_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]:
        est = min(
            grid.get((i, pmod(xxh64_str(f"{i}|{tok}"), w)), 0) for i in range(d)
        )
        out.append((tok, n, est, est - n))
    return ["token", "true_cnt", "cm_est", "overcount"], out


def ref_q_kmeans_topics(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Mirror of operators/similarity.cluster_label_purity: seeded
    bounded-sample Lloyd k-means (the IVF trainer's spec), nearest-
    centroid assignment, then per-cluster majority-label purity."""
    import pandas as pd

    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = [
        (int(vid), np.asarray(vec, dtype=np.float32).astype(np.float64), int(lab))
        for vid, vec, lab in zip(
            e["vec_id"].tolist(), e["embedding"].tolist(), e["label"].tolist()
        )
    ]
    # centroid training: xxhash64-ordered sample, cap 4096, seed 13, 8 iters
    ordered = sorted(emb, key=lambda t: (xxh64_str(str(t[0])), t[0]))[:4096]
    sample = np.stack([v for _, v, _ in ordered]).astype(np.float32)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rs = np.random.RandomState(13)
    n_centroids = 10
    centroids = sample[rs.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(8):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
    cents64 = centroids.astype(np.float64)

    counts: dict[tuple[int, int], int] = {}
    for _vid, v, lab in emb:
        x = v / max(float(np.linalg.norm(v)), 1e-12)
        cluster = int(np.argsort(-(cents64 @ x))[0])
        counts[(cluster, lab)] = counts.get((cluster, lab), 0) + 1

    out = []
    for cluster in sorted({c for c, _ in counts}):
        pairs = [(lab, n) for (c, lab), n in counts.items() if c == cluster]
        size = sum(n for _, n in pairs)
        top_label, top_n = min(pairs, key=lambda t: (-t[1], t[0]))
        out.append((cluster, size, top_label, top_n, spark_round(top_n / size, 6)))
    return ["cluster", "size", "top_label", "top_n", "purity"], out


def ref_q_hard_negatives(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Mirror of operators/similarity.hard_negatives: IVF cells from
    the seeded trainer (n_centroids=8), anchors = vec_id % 10 == 0
    probing 2 cells, k=5 nearest DIFFERENT-label corpus vectors."""
    import pandas as pd

    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = [
        (int(vid), np.asarray(vec, dtype=np.float32).astype(np.float64), int(lab))
        for vid, vec, lab in zip(
            e["vec_id"].tolist(), e["embedding"].tolist(), e["label"].tolist()
        )
    ]
    vecs = {vid: v for vid, v, _ in emb}
    labels = {vid: lab for vid, _, lab in emb}
    # centroid training: identical spec to ref_q_ivf_topk at k=8
    ordered = sorted(emb, key=lambda t: (xxh64_str(str(t[0])), t[0]))[:4096]
    sample = np.stack([v for _, v, _ in ordered]).astype(np.float32)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rs = np.random.RandomState(13)
    centroids = sample[rs.choice(len(sample), size=min(8, len(sample)), replace=False)]
    for _ in range(8):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
    cents64 = centroids.astype(np.float64)

    def probe(v, n_probe: int) -> list[int]:
        x = v / max(float(np.linalg.norm(v)), 1e-12)
        return list(np.argsort(-(cents64 @ x))[:n_probe])

    cells: dict[int, list[int]] = {}
    for vid, v, _ in emb:
        cells.setdefault(probe(v, 1)[0], []).append(vid)
    anchors = [vid for vid, _, _ in emb if vid % 10 == 0]
    out = []
    for a in sorted(anchors):
        cand = set()
        for c in probe(vecs[a], 2):
            cand.update(cells.get(c, []))
        cand.discard(a)
        cand = {n for n in cand if labels[n] != labels[a]}
        scored = []
        for nid in cand:
            cos = spark_round(
                seq_dot(vecs[nid], vecs[a]) / (seq_norm(vecs[nid]) * seq_norm(vecs[a])),
                6,
            )
            scored.append((-cos, nid))
        scored.sort()
        for rank, (negcos, nid) in enumerate(scored[:5], start=1):
            out.append((a, nid, labels[nid], -negcos, rank))
    return ["anchor_id", "neg_id", "neg_label", "cosine", "rank"], out


def ref_q_length_matched(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Mirror of operators/sampling.length_matched_sample at 10 bins,
    k=256: sketch-quantile boundaries, per-bin md5-order downsample to
    the smallest bin, XOR fingerprint of the kept ids."""
    import hashlib
    import math

    import pandas as pd

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = [(int(i), int(n)) for i, n in zip(d["doc_id"], d["n_chars"])]
    qs = [i / 10 for i in range(1, 10)]
    sampled = sorted(
        ((xxh64_str(str(did)), nc) for did, nc in rows), key=lambda t: (t[0], t[1])
    )[:256]
    samp_vals = sorted(nc for _, nc in sampled)
    n = len(samp_vals)
    bounds = [samp_vals[math.floor(q * (n - 1) + 0.5)] for q in qs]

    def bin_of(v: int) -> int:
        return sum(1 for b in bounds if v > b)

    bins: dict[int, list[int]] = {}
    for did, nc in rows:
        bins.setdefault(bin_of(nc), []).append(did)
    target = min(len(v) for v in bins.values())
    out = []
    for b in sorted(bins):
        ids = bins[b]
        kept = sorted(
            ids, key=lambda did: (hashlib.md5(str(did).encode()).hexdigest()[:8], did)
        )[:target]
        fp = 0
        for did in kept:
            fp ^= xxh64_str(str(did)) & 0xFFFFFFFFFFFFFFFF
        out.append((b, len(ids), len(kept), _signed64(fp)))
    return ["bin", "n_before", "n_after", "kept_fp"], out


def ref_q_bloom_prune(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Mirror of operators/bloom.bloom_prune_report at n_bits=512,
    n_hashes=4: every bit position re-derived as
    xxh64("<i>|<key-as-string>") mod n_bits."""
    import pandas as pd

    n_bits, n_hashes = 512, 4
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    keys = sorted(set(int(k) for k in part.loc[part["p_size"] == 50, "p_partkey"]))
    bits = [False] * n_bits
    for k in keys:
        for i in range(n_hashes):
            bits[pmod(xxh64_str(f"{i}|{k}"), n_bits)] = True
    keyset = set(keys)
    n_total = n_pass = n_true = 0
    for pk in li["l_partkey"].tolist():
        pk = int(pk)
        n_total += 1
        ok = all(
            bits[pmod(xxh64_str(f"{i}|{pk}"), n_bits)] for i in range(n_hashes)
        )
        if ok:
            n_pass += 1
        if pk in keyset:
            n_true += 1
    fp = n_pass - n_true
    rate = spark_round(fp / max(n_total - n_true, 1), 6)
    return ["n_total", "n_bloom_pass", "n_true", "n_false_pos", "fp_rate"], [
        (n_total, n_pass, n_true, fp, rate)
    ]


def ref_q_quantile_sketch(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Mirror of operators/sketches.quantile_sketch_report: min-64-
    by-xxhash64 row sample per language (k=64 so the sampling path
    binds at small SF), nearest-rank order statistics on the sampled
    values, exact nearest-rank percentiles alongside."""
    import math

    import pandas as pd

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for did, lang, nc in zip(
        d["doc_id"].tolist(), d["lang"].tolist(), d["n_chars"].tolist()
    ):
        by_lang.setdefault(lang, []).append((int(did), int(nc)))

    def nearest_rank(vals_sorted: list[int], q: float) -> int:
        idx = math.floor(q * (len(vals_sorted) - 1) + 0.5)
        return vals_sorted[idx]

    out = []
    for lang in sorted(by_lang):
        rows = by_lang[lang]
        n_rows = len(rows)
        exact_vals = sorted(nc for _, nc in rows)
        # min-k sample: signed xxhash64 order, ties break by value
        sampled = sorted(
            ((xxh64_str(str(did)), nc) for did, nc in rows),
            key=lambda t: (t[0], t[1]),
        )[:64]
        n_kept = len(sampled)
        samp_vals = sorted(nc for _, nc in sampled)
        out.append(
            (
                lang, n_rows, n_kept,
                nearest_rank(samp_vals, 0.5), nearest_rank(exact_vals, 0.5),
                nearest_rank(samp_vals, 0.9), nearest_rank(exact_vals, 0.9),
                nearest_rank(samp_vals, 0.99), nearest_rank(exact_vals, 0.99),
            )
        )
    return [
        "lang", "n_rows", "n_kept",
        "p50_est", "p50_exact", "p90_est", "p90_exact", "p99_est", "p99_exact",
    ], out


SF_QUERIES = {
    "q_kmeans_topics": ref_q_kmeans_topics,
    "q_quantile_sketch": ref_q_quantile_sketch,
    "q_hard_negatives": ref_q_hard_negatives,
    "q_bloom_prune": ref_q_bloom_prune,
    "q_length_matched": ref_q_length_matched,
    "q_heavy_hitters": ref_q_heavy_hitters,
    "q_sketch_setops": ref_q_sketch_setops,
    "q_compression_ratio": ref_q_compression_ratio,
    "q_lm_quality": ref_q_lm_quality,
    "q_dsir_weights": ref_q_dsir_weights,
    "q_sketch_recall": ref_q_sketch_recall,
    "q_novelty_screen": ref_q_novelty_screen,
    "q_mixture_sample": ref_q_mixture_sample,
    "q_minhash_dedup_docs": ref_q_minhash_dedup_docs,
    "q_pack_sequences": ref_q_pack_sequences,
    "q_simhash_dedup_docs": ref_q_simhash_dedup_docs,
    "q_doc_fingerprints": ref_q_doc_fingerprints,
    "q_lsh_topk": ref_q_lsh_topk,
    "q_ivf_topk": ref_q_ivf_topk,
    "q_pq_topk": ref_q_pq_topk,
    "q_sq_topk": ref_q_sq_topk,
    "q_dedup_clusters": ref_q_dedup_clusters,
    "q_semdedup": ref_q_semdedup,
    "q_leakage_split": ref_q_leakage_split,
    "q_bpe_vocab": ref_q_bpe_vocab,
    "q_bpe_encode": ref_q_bpe_encode,
}

CORPUS_QUERIES = {
    "q_sketch_cardinality": ref_q_sketch_cardinality,
    "q_ppr": ref_q_ppr,
    "q_functional_conflicts": ref_q_functional_conflicts,
    "q_jsonld_export": ref_q_jsonld_export,
    "q_dot_export": ref_q_dot_export,
    "q_trig_export": ref_q_trig_export,
    "q_hits": ref_q_hits,
    "q_link_predict": ref_q_link_predict,
    "q_triangle_count": ref_q_triangle_count,
    "q_clustering_coef": ref_q_clustering_coef,
    "q_text_normalize": ref_q_text_normalize,
    "q_doc_lint": ref_q_doc_lint,
    "q_cc_incremental": ref_q_cc_incremental,
    "q_kg_extract": ref_q_kg_extract,
    "q_triples_two_hop": ref_q_triples_two_hop,
    "q_serialize_roundtrip": ref_q_serialize_roundtrip,
    "q_media_features": ref_q_media_features,
    "q_audio_stats": ref_q_audio_stats,
    "q_flac_audio": ref_q_flac_audio,
    "q_frame_sample": ref_q_frame_sample,
    "q_predicate_profile": ref_q_predicate_profile,
    "q_pagerank_kg": ref_q_pagerank_kg,
    "q_pagerank_incremental": ref_q_pagerank_incremental,
    "q_shortest_paths": ref_q_shortest_paths,
    "q_bgp_typed_links": ref_q_bgp_typed_links,
    "q_bgp_note_chain": ref_q_bgp_note_chain,
    "q_kg_closure": ref_q_kg_closure,
    "q_entity_ids": ref_q_entity_ids,
    "q_kg_negative_samples": ref_q_kg_negative_samples,
    "q_kg_delta": ref_q_kg_delta,
    "q_entity_cards": ref_q_entity_cards,
    "q_path_social": ref_q_path_social,
    "q_path_members": ref_q_path_members,
    "q_rdfs_entail": ref_q_rdfs_entail,
    "q_sparql_optional": ref_q_sparql_optional,
    "q_sparql_agg": ref_q_sparql_agg,
    "q_sparql_having": ref_q_sparql_having,
    "q_sparql_bind": ref_q_sparql_bind,
    "q_sparql_union": ref_q_sparql_union,
    "q_sparql_minus": ref_q_sparql_minus,
    "q_sparql_topk": ref_q_sparql_topk,
    "q_line_dedup": ref_q_line_dedup,
    "q_char_sets": ref_q_char_sets,
    "q_kg_walks": ref_q_kg_walks,
    "q_shacl_report": ref_q_shacl_report,
    "q_kg_verbalize": ref_q_kg_verbalize,
    "q_kg_communities": ref_q_kg_communities,
    "q_sparql_construct": ref_q_sparql_construct,
    "q_ntriples_export": ref_q_ntriples_export,
    "q_nquads_export": ref_q_nquads_export,
    "q_collections": ref_q_collections,
    "q_containers": ref_q_containers,
    "q_sparql_graph": ref_q_sparql_graph,
    "q_triple_provenance": ref_q_triple_provenance,
    "q_schema_graph": ref_q_schema_graph,
    "q_bfs_levels": ref_q_bfs_levels,
    "q_path_nps": ref_q_path_nps,
    "q_describe": ref_q_describe,
    "q_kcore": ref_q_kcore,
    "q_sameas_canonical": ref_q_sameas_canonical,
    "q_image_phash": ref_q_image_phash,
    "q_graph_fingerprint": ref_q_graph_fingerprint,
    "q_pipeline_lineage": ref_q_pipeline_lineage,
    "q_kg_temporal": ref_q_kg_temporal,
    "q_sparql_update": ref_q_sparql_update,
    "q_void_stats": ref_q_void_stats,
    "q_owl_entail": ref_q_owl_entail,
    "q_owl_chains": ref_q_owl_chains,
    "q_bnode_canonical": ref_q_bnode_canonical,
    "q_prefix_induction": ref_q_prefix_induction,
    "q_skolemize": ref_q_skolemize,
    "q_property_table": ref_q_property_table,
}

# DuckDB column types per query — chosen to land in pandas with the
# exact dtype the Spark query produces (the driver's hash sees dtypes)
DUCK_TYPES = {
    "q_sketch_cardinality": {"predicate": "VARCHAR", "n_exact": "BIGINT", "hll_est": "DOUBLE", "kmv_est": "DOUBLE"},
    "q_heavy_hitters": {"token": "VARCHAR", "true_cnt": "BIGINT", "cm_est": "BIGINT", "overcount": "BIGINT"},
    "q_compression_ratio": {"doc_id": "BIGINT", "n_bytes": "BIGINT", "n_compressed": "BIGINT", "compression_ratio": "DOUBLE"},
    "q_sketch_setops": {"set_a": "VARCHAR", "set_b": "VARCHAR", "exact_a": "BIGINT", "exact_b": "BIGINT", "exact_union": "BIGINT", "exact_inter": "BIGINT", "union_est": "DOUBLE", "jaccard_est": "DOUBLE", "inter_est": "DOUBLE"},
    "q_ppr": {"node": "VARCHAR", "rank_fp": "BIGINT"},
    "q_functional_conflicts": {"predicate": "VARCHAR", "n_subjects": "BIGINT", "n_multi": "BIGINT", "max_objects": "BIGINT", "conflict_fp": "BIGINT"},
    "q_jsonld_export": {"bucket": "BIGINT", "n_lines": "BIGINT", "total_chars": "BIGINT", "line_fp": "BIGINT"},
    "q_dot_export": {"bucket": "BIGINT", "n_lines": "BIGINT", "total_chars": "BIGINT", "line_fp": "BIGINT"},
    "q_trig_export": {"graph": "VARCHAR", "n_chars": "INTEGER", "block_fp": "BIGINT"},
    "q_hits": {"node": "VARCHAR", "hub_fp": "BIGINT", "auth_fp": "BIGINT"},
    "q_link_predict": {"a": "VARCHAR", "b": "VARCHAR", "n_common": "BIGINT", "aa_fp": "BIGINT"},
    "q_sparql_update": {"predicate": "VARCHAR", "n_triples": "BIGINT", "triple_fp": "BIGINT"},
    "q_void_stats": {"part": "VARCHAR", "key": "VARCHAR", "n_triples": "BIGINT", "n_entities": "BIGINT", "member_fp": "BIGINT"},
    "q_owl_entail": {"rule": "VARCHAR", "predicate": "VARCHAR", "n_new": "BIGINT", "new_fp": "BIGINT"},
    "q_owl_chains": {"rule": "VARCHAR", "predicate": "VARCHAR", "n_new": "BIGINT", "new_fp": "BIGINT"},
    "q_bnode_canonical": {"canon": "BIGINT", "n_bnodes": "BIGINT", "bnode_fp": "BIGINT"},
    "q_prefix_induction": {"prefix": "VARCHAR", "namespace": "VARCHAR", "n_occurrences": "BIGINT", "n_distinct_iris": "BIGINT"},
    "q_skolemize": {"predicate": "VARCHAR", "n_triples": "BIGINT", "sk_fp": "BIGINT"},
    "q_property_table": {"n_filled": "INTEGER", "n_subjects": "BIGINT", "row_fp": "BIGINT"},
    "q_lm_quality": {"doc_id": "BIGINT", "n_grams": "BIGINT", "score_num": "BIGINT", "n_oov": "BIGINT", "lm_q": "DOUBLE"},
    "q_dsir_weights": {"doc_id": "BIGINT", "n_bigrams": "BIGINT", "weight_num": "BIGINT", "dsir_w": "DOUBLE"},
    "q_sketch_recall": {"n_true": "BIGINT", "n_lsh": "BIGINT", "n_tp": "BIGINT", "n_missed": "BIGINT", "n_extra": "BIGINT", "recall": "DOUBLE"},
    "q_sameas_canonical": {"subject": "VARCHAR", "n_aliases": "BIGINT", "n_triples": "BIGINT", "triple_fp": "BIGINT"},
    "q_image_phash": {"id1": "VARCHAR", "id2": "VARCHAR", "hamming": "INTEGER"},
    "q_graph_fingerprint": {"doc_id": "VARCHAR", "graph_fp": "BIGINT", "n_triples": "BIGINT", "n_blanks": "BIGINT"},
    "q_pipeline_lineage": {"stage": "VARCHAR", "rows": "BIGINT", "resumed_second_run": "BOOLEAN"},
    "q_kg_temporal": {"predicate": "VARCHAR", "n_raw": "BIGINT", "n_intervals": "BIGINT", "n_t1": "BIGINT", "n_t2": "BIGINT", "n_added": "BIGINT", "n_removed": "BIGINT", "added_fp": "BIGINT", "removed_fp": "BIGINT"},
    "q_mixture_sample": {"source": "VARCHAR", "n_docs": "BIGINT", "doc_fp": "BIGINT", "sum_chars": "BIGINT"},
    "q_novelty_screen": {"doc_id": "BIGINT", "status": "VARCHAR", "matched_id": "BIGINT", "jaccard": "DOUBLE"},
    "q_triangle_count": {"node": "VARCHAR", "n_triangles": "BIGINT"},
    "q_clustering_coef": {"node": "VARCHAR", "deg": "BIGINT", "n_triangles": "BIGINT", "lcc": "DOUBLE"},
    "q_text_normalize": {"doc_id": "BIGINT", "norm_text": "VARCHAR", "n_raw_chars": "BIGINT", "n_norm_chars": "BIGINT", "changed": "BOOLEAN"},
    "q_doc_lint": {"doc_id": "VARCHAR", "issues_csv": "VARCHAR", "quarantined": "BOOLEAN"},
    "q_cc_incremental": {"n_assigned": "BIGINT", "n_components": "BIGINT", "n_delta_rows": "BIGINT", "assign_fp": "BIGINT"},
    "q_kg_extract": {"objecttype": "VARCHAR", "n_triples": "BIGINT", "n_subjects": "BIGINT"},
    "q_triples_two_hop": {"p1": "VARCHAR", "p2": "VARCHAR", "n_paths": "BIGINT"},
    "q_serialize_roundtrip": {"subject_initial": "VARCHAR", "n_subjects": "BIGINT", "total_bytes": "BIGINT"},
    "q_minhash_dedup_docs": {"src": "BIGINT", "dst": "BIGINT", "jaccard": "DOUBLE"},
    "q_simhash_dedup_docs": {"id1": "BIGINT", "id2": "BIGINT", "hamming": "INTEGER"},
    "q_doc_fingerprints": {"doc_id": "BIGINT", "fingerprint": "BIGINT", "simhash": "BIGINT"},
    "q_lsh_topk": {"query_id": "BIGINT", "neighbor_id": "BIGINT", "cosine": "DOUBLE", "rank": "INTEGER"},
    "q_ivf_topk": {"query_id": "BIGINT", "neighbor_id": "BIGINT", "cosine": "DOUBLE", "rank": "INTEGER"},
    "q_pq_topk": {"query_id": "BIGINT", "neighbor_id": "BIGINT", "score": "DOUBLE", "rank": "INTEGER"},
    "q_sq_topk": {"query_id": "BIGINT", "neighbor_id": "BIGINT", "score": "DOUBLE", "rank": "INTEGER"},
    "q_kmeans_topics": {"cluster": "INTEGER", "size": "BIGINT", "top_label": "INTEGER", "top_n": "BIGINT", "purity": "DOUBLE"},
    "q_quantile_sketch": {
        "lang": "VARCHAR", "n_rows": "BIGINT", "n_kept": "BIGINT",
        "p50_est": "BIGINT", "p50_exact": "BIGINT", "p90_est": "BIGINT",
        "p90_exact": "BIGINT", "p99_est": "BIGINT", "p99_exact": "BIGINT",
    },
    "q_hard_negatives": {
        "anchor_id": "BIGINT", "neg_id": "BIGINT", "neg_label": "INTEGER",
        "cosine": "DOUBLE", "rank": "INTEGER",
    },
    "q_bloom_prune": {
        "n_total": "BIGINT", "n_bloom_pass": "BIGINT", "n_true": "BIGINT",
        "n_false_pos": "BIGINT", "fp_rate": "DOUBLE",
    },
    "q_length_matched": {
        "bin": "INTEGER", "n_before": "BIGINT", "n_after": "BIGINT",
        "kept_fp": "BIGINT",
    },
    "q_media_features": {"media_type": "VARCHAR", "n_media": "BIGINT", "total_bytes": "BIGINT", "f0_sum": "DOUBLE", "px_mean_sum": "DOUBLE"},
    "q_audio_stats": {"media_ref": "VARCHAR", "duration_ms": "INTEGER", "n_bytes": "INTEGER", "duration_s": "DOUBLE", "rms": "DOUBLE", "peak": "DOUBLE", "zcr": "DOUBLE"},
    "q_flac_audio": {"media_ref": "VARCHAR", "n_wav_bytes": "INTEGER", "lossless": "BOOLEAN", "duration_s": "DOUBLE", "rms": "DOUBLE", "peak": "DOUBLE", "zcr": "DOUBLE"},
    "q_frame_sample": {"media_ref": "VARCHAR", "frame_index": "INTEGER", "ts_ms": "INTEGER", "px_sum": "BIGINT"},
    "q_dedup_clusters": {"cluster_size": "BIGINT", "n_clusters": "BIGINT"},
    "q_predicate_profile": {
        "predicate": "VARCHAR", "n_triples": "BIGINT", "n_subjects": "BIGINT",
        "n_objects": "BIGINT", "max_fanout": "BIGINT", "is_functional": "BOOLEAN",
    },
    "q_pagerank_kg": {"node": "VARCHAR", "rank_fp": "BIGINT"},
    "q_pagerank_incremental": {"node": "VARCHAR", "rank_fp": "BIGINT"},
    "q_shortest_paths": {"landmark": "VARCHAR", "n_reached": "BIGINT", "max_dist": "BIGINT", "sum_dist": "BIGINT", "dist_fp": "BIGINT"},
    "q_entity_ids": {"entity": "VARCHAR", "entity_id": "BIGINT"},
    "q_kg_negative_samples": {
        "subject": "VARCHAR", "predicate": "VARCHAR", "true_object": "VARCHAR",
        "k": "INTEGER", "neg_object": "VARCHAR",
    },
    "q_bgp_typed_links": {"cls": "VARCHAR", "n_links": "BIGINT", "n_entities": "BIGINT"},
    "q_pack_sequences": {
        "doc_id": "BIGINT", "n_tokens": "BIGINT", "bucket": "INTEGER",
        "pack_id": "BIGINT", "pack_pos": "INTEGER",
    },
    "q_bgp_note_chain": {"s": "VARCHAR", "p": "VARCHAR", "note": "VARCHAR"},
    "q_kg_closure": {"src": "VARCHAR", "n_reachable": "BIGINT", "dst_fp": "BIGINT"},
    "q_kg_delta": {
        "predicate": "VARCHAR", "n_added": "BIGINT", "n_removed": "BIGINT",
        "added_fp": "BIGINT", "removed_fp": "BIGINT",
    },
    "q_entity_cards": {
        "subject": "VARCHAR", "n_triples": "BIGINT", "n_predicates": "BIGINT",
        "n_literals": "BIGINT", "n_links": "BIGINT", "card_fp": "BIGINT",
    },
    "q_path_social": {"src": "VARCHAR", "n_reachable": "BIGINT", "dst_fp": "BIGINT"},
    "q_path_members": {"src": "VARCHAR", "n_members": "BIGINT", "member_fp": "BIGINT"},
    "q_rdfs_entail": {"predicate": "VARCHAR", "n_entailed": "BIGINT", "pair_fp": "BIGINT"},
    "q_kcore": {"node": "VARCHAR", "degree": "BIGINT"},
    "q_sparql_optional": {"s": "VARCHAR", "name": "VARCHAR", "mbox": "VARCHAR", "n_bindings": "BIGINT"},
    "q_sparql_agg": {"t": "VARCHAR", "n_rows": "BIGINT", "n_subjects": "BIGINT"},
    "q_sparql_having": {"p": "VARCHAR", "n_lit": "BIGINT", "total": "DOUBLE", "mean_val": "DOUBLE", "lex_min": "VARCHAR"},
    "q_sparql_bind": {"local": "VARCHAR", "bucket": "VARCHAR", "n_lit": "BIGINT", "total_score": "DOUBLE"},
    "q_semdedup": {"vec_id": "BIGINT", "component": "BIGINT", "keep_id": "BIGINT", "csim": "DOUBLE", "kept": "BOOLEAN"},
    "q_leakage_split": {"doc_id": "BIGINT", "group_key": "BIGINT", "split": "VARCHAR"},
    "q_bpe_vocab": {"rank": "INTEGER", "left": "VARCHAR", "right": "VARCHAR", "merged": "VARCHAR", "pair_freq": "BIGINT"},
    "q_bpe_encode": {"doc_id": "BIGINT", "n_words": "INTEGER", "n_tokens": "INTEGER", "tok_fp": "VARCHAR"},
    "q_sparql_union": {"a": "VARCHAR", "n_links": "BIGINT", "n_distinct": "BIGINT", "n_named": "BIGINT", "b_fp": "BIGINT"},
    "q_sparql_minus": {"s": "VARCHAR", "name": "VARCHAR", "n_no_enemy": "BIGINT", "n_knows": "BIGINT"},
    "q_sparql_topk": {"s": "VARCHAR", "o": "VARCHAR", "deg": "BIGINT"},
    "q_line_dedup": {"doc_id": "VARCHAR", "n_lines": "BIGINT", "n_removed": "BIGINT", "clean_len": "BIGINT", "clean_md5": "VARCHAR"},
    "q_char_sets": {"cs": "VARCHAR", "n_preds": "INTEGER", "n_subjects": "BIGINT", "n_triples": "BIGINT"},
    "q_kg_walks": {"start": "VARCHAR", "n_visits": "BIGINT", "n_distinct_nodes": "BIGINT", "walk_fp": "BIGINT"},
    "q_shacl_report": {"shape_id": "VARCHAR", "constraint": "VARCHAR", "n_violations": "BIGINT", "viol_fp": "BIGINT"},
    "q_kg_verbalize": {"subject": "VARCHAR", "n_facts": "INTEGER", "n_total_facts": "BIGINT", "n_tokens": "INTEGER", "text": "VARCHAR"},
    "q_kg_communities": {"label": "VARCHAR", "n_members": "BIGINT", "member_fp": "BIGINT"},
    "q_sparql_construct": {"predicate": "VARCHAR", "objecttype": "VARCHAR", "n_triples": "BIGINT", "pair_fp": "BIGINT"},
    "q_ntriples_export": {"pred_token": "VARCHAR", "n_lines": "BIGINT", "total_bytes": "BIGINT", "line_fp": "BIGINT"},
    "q_nquads_export": {"pred_token": "VARCHAR", "n_lines": "BIGINT", "total_bytes": "BIGINT", "line_fp": "BIGINT"},
    "q_sparql_graph": {"g": "VARCHAR", "n_links": "BIGINT", "n_subjects": "BIGINT", "n_types": "BIGINT"},
    "q_collections": {"head": "VARCHAR", "n_items": "BIGINT", "items_fp": "BIGINT", "first_item": "VARCHAR", "last_item": "VARCHAR"},
    "q_containers": {"head": "VARCHAR", "n_items": "BIGINT", "items_fp": "BIGINT", "first_item": "VARCHAR", "last_item": "VARCHAR"},
    "q_triple_provenance": {"subject": "VARCHAR", "predicate": "VARCHAR", "object": "VARCHAR", "n_docs": "BIGINT", "n_mentions": "BIGINT", "doc_fp": "BIGINT"},
    "q_schema_graph": {"s_cls": "VARCHAR", "predicate": "VARCHAR", "o_cls": "VARCHAR", "n_links": "BIGINT", "link_fp": "BIGINT"},
    "q_bfs_levels": {"level": "INTEGER", "n_nodes": "BIGINT", "node_fp": "BIGINT"},
    "q_path_nps": {"src": "VARCHAR", "n_pairs": "BIGINT", "dst_fp": "BIGINT"},
    "q_describe": {"subject": "VARCHAR", "n_triples": "BIGINT", "desc_fp": "BIGINT"},
}
